"""Pose-graph optimization (the essential-graph solve of loop closing).

Counterpart of ``Optimizer::OptimizeEssentialGraph``
(src/Optimizer.cc:3669; invoked by LoopClosing::CorrectLoop) — relative
SE(3) constraints between keyframes, solved after a loop detection to
spread the loop-closure correction over the trajectory.

TPU shape: all edge residuals r_e = Log(Z_ij^-1 Ti Tj^-1) evaluate as one
batch; the Jacobian over the stacked pose tangent comes from ``jacfwd``
(at keyframe-graph scale — hundreds of poses — the dense normal system is
a few-thousand-dim solve, ideal for the MXU; no sparse machinery needed).
Gauge: pose 0 is fixed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimot_track_tpu.geometry import se3


class PoseGraphResult(NamedTuple):
    poses: jnp.ndarray    # (M, 4, 4) optimized
    chi2: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    poses_init: jnp.ndarray,   # (M, 4, 4) Tcw estimates
    edges_ij: jnp.ndarray,     # (E, 2) int32 (i, j) pose indices
    Z: jnp.ndarray,            # (E, 4, 4) measured T_i @ T_j^-1
    weights: jnp.ndarray,      # (E,) edge information scale
    iters: int = 20,
    lam: float = 1e-4,
) -> PoseGraphResult:
    M = poses_init.shape[0]

    def residuals(xi_flat, base):
        xi = xi_flat.reshape(M, 6)
        T = se3.exp_se3(xi) @ base
        Ti = T[edges_ij[:, 0]]
        Tj = T[edges_ij[:, 1]]
        rel = jnp.einsum("eij,ejk->eik", Ti, se3.inverse(Tj))
        err = jnp.einsum("eij,ejk->eik", se3.inverse(Z), rel)
        return (se3.log_se3(err) * jnp.sqrt(weights)[:, None]).reshape(-1)

    def body(_, base):
        xi0 = jnp.zeros(M * 6)
        r = residuals(xi0, base)
        J = jax.jacfwd(residuals)(xi0, base)          # (6E, 6M)
        # gauge: fix pose 0 by zeroing its columns
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (M - 1))])
        J = J * mask[None, :]
        H = J.T @ J + lam * jnp.eye(6 * M)
        g = J.T @ r
        dxi = jnp.linalg.solve(H, -g) * mask
        return se3.exp_se3(dxi.reshape(M, 6)) @ base

    poses = jax.lax.fori_loop(0, iters, body, poses_init)
    r_fin = residuals(jnp.zeros(M * 6), poses)
    return PoseGraphResult(poses=poses, chi2=jnp.sum(r_fin * r_fin))


def odometry_edges(poses: jnp.ndarray):
    """Consecutive-pose odometry constraints from a trajectory."""
    M = poses.shape[0]
    ij = jnp.stack([jnp.arange(1, M), jnp.arange(0, M - 1)], axis=-1).astype(jnp.int32)
    Z = jnp.einsum("eij,ejk->eik", poses[1:], se3.inverse(poses[:-1]))
    return ij, Z
