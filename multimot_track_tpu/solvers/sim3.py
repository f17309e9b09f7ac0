"""Sim(3) alignment + RANSAC — the loop-closing similarity solver.

Counterpart of the reference's 3-point Horn Sim3 RANSAC
(src/Sim3Solver.cc:``Sim3Solver::iterate``; used by
LoopClosing::ComputeSim3).  Closed-form Umeyama alignment with scale,
batched over minimal samples; inlier test = symmetric reprojection error in
both frames, like the reference's two chi2 gates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimot_track_tpu.geometry import camera


def umeyama(src: jnp.ndarray, dst: jnp.ndarray, with_scale: bool = True):
    """dst ~= s R src + t.  src/dst: (..., N, 3).  Returns (s, R, t)."""
    n = src.shape[-2]
    cs = jnp.mean(src, axis=-2)
    cd = jnp.mean(dst, axis=-2)
    s0 = src - cs[..., None, :]
    d0 = dst - cd[..., None, :]
    cov = jnp.einsum("...ni,...nj->...ij", d0, s0) / n
    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = (
        jnp.zeros_like(cov)
        .at[..., 0, 0].set(1.0)
        .at[..., 1, 1].set(1.0)
        .at[..., 2, 2].set(det)
    )
    R = jnp.einsum("...ij,...jk,...kl->...il", U, D, Vt)
    var_s = jnp.mean(jnp.sum(s0 * s0, axis=-1), axis=-1)
    trace_DS = S[..., 0] + S[..., 1] + det * S[..., 2]
    s = jnp.where(
        jnp.asarray(with_scale), trace_DS / jnp.maximum(var_s, 1e-12), jnp.ones_like(var_s)
    )
    t = cd - s[..., None] * jnp.einsum("...ij,...j->...i", R, cs)
    return s, R, t


class Sim3Result(NamedTuple):
    scale: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def ransac_sim3(
    key: jax.Array,
    X1: jnp.ndarray,      # (N, 3) points in keyframe-1 camera coords
    X2: jnp.ndarray,      # (N, 3) corresponding points in keyframe-2 camera
    valid: jnp.ndarray,   # (N,)
    fx, fy, cx, cy,
    th2_px: float = 9.21,   # chi2 gates (Sim3Solver mTh... 9.21/7.78-like)
    iters: int = 300,
    fix_scale: bool = False,
) -> Sim3Result:
    N = X1.shape[0]
    vf = valid.astype(jnp.float32)
    p = vf / jnp.maximum(jnp.sum(vf), 1.0)
    idx = jax.random.choice(key, N, shape=(iters, 3), replace=True, p=p)
    s, R, t = umeyama(X1[idx], X2[idx], with_scale=not fix_scale)

    uv1 = camera.project(X1, fx, fy, cx, cy)
    uv2 = camera.project(X2, fx, fy, cx, cy)

    def score(s_i, R_i, t_i):
        X12 = s_i * jnp.einsum("ij,nj->ni", R_i, X1) + t_i
        e2 = jnp.sum((camera.project(X12, fx, fy, cx, cy) - uv2) ** 2, axis=-1)
        s_inv = 1.0 / jnp.maximum(s_i, 1e-9)
        X21 = s_inv * jnp.einsum("ji,nj->ni", R_i, X2 - t_i)
        e1 = jnp.sum((camera.project(X21, fx, fy, cx, cy) - uv1) ** 2, axis=-1)
        inl = valid & (e1 < th2_px) & (e2 < th2_px)
        return inl, jnp.sum(inl.astype(jnp.int32))

    inls, counts = jax.vmap(score)(s, R, t)
    best = jnp.argmax(counts)
    return Sim3Result(
        scale=s[best], R=R[best], t=t[best],
        inliers=inls[best], n_inliers=counts[best],
    )
