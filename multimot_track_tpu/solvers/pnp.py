"""Batched 2D-3D PnP (DLT + Gauss-Newton), depth-free.

Counterpart of the reference's EPnP relocalisation solver
(src/PnPsolver.cc, Lepetit's epnp + RANSAC): used where current-frame depth
is unavailable (monocular, relocalisation).  The TPU design swaps the
control-point formulation for a 6-point DLT nullspace (one small SVD per
hypothesis, vmapped) followed by projection-space Gauss-Newton — all
fixed-shape and batch-friendly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimot_track_tpu.geometry import se3
from multimot_track_tpu.solvers.ransac import _count_inliers, _gn_refine


def dlt_pose(Xw: jnp.ndarray, uv: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Direct linear transform from >= 6 2D-3D pairs.

    Xw: (..., n, 3); uv: (..., n, 2) pixels.  Returns (..., 4, 4) with R
    projected onto SO(3) and scale recovered from ||R|| (Frobenius / sqrt3).
    """
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    n = Xw.shape[-2]
    zeros = jnp.zeros_like(Xw)
    ones = jnp.ones(Xw.shape[:-1] + (1,), Xw.dtype)
    Xh = jnp.concatenate([Xw, ones], axis=-1)                  # (..., n, 4)
    # rows: [X 0 -x*X ; 0 X -y*X] with homogeneous X
    r1 = jnp.concatenate([Xh, jnp.zeros_like(Xh), -x[..., None] * Xh], axis=-1)
    r2 = jnp.concatenate([jnp.zeros_like(Xh), Xh, -y[..., None] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)                      # (..., 2n, 12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    p = Vt[..., -1, :]                                          # (..., 12)
    P = p.reshape(p.shape[:-1] + (3, 4))
    M = P[..., :3]
    # scale + chirality: mean projected depth must be positive
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(M)) + 1e-20)
    depth_sign = jnp.sign(
        jnp.sum(
            (jnp.einsum("...ij,...nj->...ni", M, Xw) + P[..., None, :, 3])[..., 2],
            axis=-1,
        )
    )
    P = P * (depth_sign / scale)[..., None, None]
    M = P[..., :3]
    U, _, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt2))
    D = (
        jnp.zeros_like(M)
        .at[..., 0, 0].set(1.0)
        .at[..., 1, 1].set(1.0)
        .at[..., 2, 2].set(det)
    )
    R = jnp.einsum("...ij,...jk,...kl->...il", U, D, Vt2)
    t = P[..., :, 3]
    return se3.make_T(R, t)


class PnPResult(NamedTuple):
    T: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("iters", "refine_iters", "min_set"))
def ransac_pnp(
    key: jax.Array,
    Xw: jnp.ndarray,       # (N, 3)
    uv: jnp.ndarray,       # (N, 2)
    valid: jnp.ndarray,    # (N,)
    fx, fy, cx, cy,
    thresh: float = 5.99,  # px; relocalisation-style gate (PnPsolver th2)
    iters: int = 300,
    refine_iters: int = 8,
    min_set: int = 10,
) -> PnPResult:
    """Depth-free RANSAC PnP (PnPsolver::iterate analog).

    ``min_set`` is deliberately ABOVE the 6-point minimum: the DLT is
    ill-conditioned on near-planar scenes (street scenes triangulated
    under forward motion are a thin slab — measured PCA 2.28/0.44/0.10 on
    the EuRoC-ified kitti_sample), and 6-point hypotheses there return
    poses that are wrong by tens of units while 10-point ones recover the
    pose to ~1e-2.  10 points keeps the all-inlier sample probability
    workable (0.9^10 = 35 % per draw at reloc-grade inlier rates) while
    over-determining the nullspace against the slab degeneracy — the same
    reason the reference's EPnP uses 4 control points fit to ALL inliers
    rather than a minimal set (src/PnPsolver.cc).
    """
    N = Xw.shape[0]
    vf = valid.astype(jnp.float32)
    p = vf / jnp.maximum(jnp.sum(vf), 1.0)
    idx = jax.random.choice(key, N, shape=(iters, min_set), replace=True, p=p)
    T_hyp = dlt_pose(Xw[idx], uv[idx], fx, fy, cx, cy)

    def score(T):
        _, n = _count_inliers(T, Xw, uv, valid, thresh, fx, fy, cx, cy)
        return n

    counts = jax.vmap(score)(T_hyp)
    best = jnp.argmax(counts)
    T_best = T_hyp[best]
    # iterated refinement (PnPsolver::Refine loop): GN on the inlier set,
    # re-classify, repeat — one round leaves the pose hostage to the raw
    # minimal-sample hypothesis's inlier selection
    T_cur = T_best
    inl_cur, n_cur = _count_inliers(T_best, Xw, uv, valid, thresh, fx, fy, cx, cy)
    for _ in range(2):
        T_ref = _gn_refine(
            T_cur, Xw, uv, inl_cur.astype(jnp.float32), refine_iters, fx, fy, cx, cy
        )
        inl1, n1 = _count_inliers(T_ref, Xw, uv, valid, thresh, fx, fy, cx, cy)
        take = n1 >= n_cur
        T_cur = jnp.where(take, T_ref, T_cur)
        inl_cur = jnp.where(take, inl1, inl_cur)
        n_cur = jnp.maximum(n_cur, n1)
    return PnPResult(T=T_cur, inliers=inl_cur, n_inliers=n_cur)
