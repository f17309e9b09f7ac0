"""Distributed sliding-window BA: tracks sharded over the mesh.

The BASELINE multi-host configuration ("keyframes/object tracks sharded
across hosts, reduced camera system assembled via psum") at the window-BA
level: each device holds a shard of the point tracks, computes its local
pose-block/Schur contributions (the same algebra as
solvers/window_ba.solve_window_ba), and only the reduced 6(F-1)-dim
system plus the scalar objective cross the interconnect per LM iteration
— a few KB regardless of how many million tracks the window carries.

Inverse-depth variables stay shard-local (their Schur blocks are scalars);
back-substitution never communicates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.solvers.window_ba import WindowBAParams
from multimot_track_tpu.parallel.mesh import POINT_AXIS


def make_distributed_window_ba(mesh: Mesh, params: WindowBAParams, fx, fy, cx, cy):
    """Returns solve(poses_init, uv, alive, depth0) with uv/alive/depth0
    sharded on their track axis (uv: (F, N, 2) -> N sharded)."""
    p = params
    rep = P()
    trk2 = P(None, POINT_AXIS)
    trk3 = P(None, POINT_AXIS, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, trk3, trk2, P(POINT_AXIS)),
        out_specs=(rep, P(POINT_AXIS)),
    )
    def solve(poses_init, uv, alive, depth0):
        F = uv.shape[0]
        uv0 = uv[0]
        valid0 = alive[0] & (depth0 > 0)
        rho0 = jnp.where(valid0, 1.0 / jnp.maximum(depth0, 1e-3), 1.0)
        w_prior = 1.0 / (p.depth_prior_sigma ** 2)
        obs = uv[1:]
        vis = alive[1:] & valid0[None, :]
        dirs = camera.backproject(uv0, jnp.ones_like(depth0), fx, fy, cx, cy)

        def objective(T_stack, rho):
            X = dirs / rho[:, None]
            y = jnp.einsum("fij,nj->fni", T_stack[:, :3, :3], X) + T_stack[:, None, :3, 3]
            r = obs - camera.project(y, fx, fy, cx, cy)
            rn2 = jnp.sum(r * r, axis=-1)
            d2 = p.huber_px ** 2
            rob = jnp.where(rn2 <= d2, rn2,
                            2.0 * p.huber_px * jnp.sqrt(jnp.maximum(rn2, 1e-20)) - d2)
            prior = w_prior * (rho - rho0) ** 2
            loc = jnp.sum(jnp.where(vis, rob, 0.0)) + jnp.sum(jnp.where(valid0, prior, 0.0))
            return jax.lax.psum(loc, POINT_AXIS)

        def blocks(T_stack, rho, lam):
            X = dirs / rho[:, None]
            y = jnp.einsum("fij,nj->fni", T_stack[:, :3, :3], X) + T_stack[:, None, :3, 3]
            uv_hat = camera.project(y, fx, fy, cx, cy)
            r = obs - uv_hat
            rn2 = jnp.sum(r * r, axis=-1)
            w_rob = jnp.where(rn2 <= p.huber_px ** 2, 1.0,
                              p.huber_px / jnp.sqrt(jnp.maximum(rn2, 1e-20)))
            w = jnp.where(vis, w_rob, 0.0)
            z = jnp.maximum(y[..., 2], 1e-6)
            inv_z = 1.0 / z
            zero = jnp.zeros_like(z)
            dpi = jnp.stack([
                jnp.stack([fx * inv_z, zero, -fx * y[..., 0] * inv_z * inv_z], -1),
                jnp.stack([zero, fy * inv_z, -fy * y[..., 1] * inv_z * inv_z], -1),
            ], -2)
            eye3 = jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), y.shape[:-1] + (3, 3))
            dy_dxi = jnp.concatenate([-se3.hat(y), eye3], -1)
            Jp = -jnp.einsum("fnij,fnjk->fnik", dpi, dy_dxi)
            dy_drho = -jnp.einsum("fij,nj->fni", T_stack[:, :3, :3], X) / rho[None, :, None]
            Jr = -jnp.einsum("fnij,fnj->fni", dpi, dy_drho)

            H_ff = jnp.einsum("fnia,fnib,fn->fab", Jp, Jp, w)
            g_f = jnp.einsum("fnia,fni,fn->fa", Jp, r, w)
            h_r = jnp.einsum("fni,fni,fn->n", Jr, Jr, w) + w_prior + lam
            g_r = jnp.einsum("fni,fni,fn->n", Jr, r, w) + w_prior * (rho - rho0)
            B = jnp.einsum("fnia,fni,fn->nfa", Jp, Jr, w)
            Bh = B / h_r[:, None, None]
            H_loc = -jnp.einsum("nfa,ngb->fgab", Bh, B)
            idx = jnp.arange(F - 1)
            H_loc = H_loc.at[idx, idx].add(H_ff)
            g_loc = g_f - jnp.einsum("nfa,n->fa", Bh, g_r)
            return Jp, Jr, h_r, g_r, B, H_loc, g_loc

        T0 = poses_init[1:]
        F0 = objective(T0, rho0)
        lam0 = jnp.float32(p.tau) * jnp.maximum(
            1.0,
            jax.lax.pmax(
                (fx / jnp.maximum(jnp.min(jnp.where(valid0, depth0, 1e9)), 1.0)) ** 2,
                POINT_AXIS,
            ),
        )
        D = 6 * (F - 1)

        def body(state):
            it, T_stack, rho, Fv, lam, nu = state
            Jp, Jr, h_r, g_r, B, H_loc, g_loc = blocks(T_stack, rho, lam)
            H = jax.lax.psum(H_loc, POINT_AXIS)
            g = jax.lax.psum(g_loc, POINT_AXIS)
            H = H.at[jnp.arange(F - 1), jnp.arange(F - 1)].add(lam * jnp.eye(6))
            Hd = H.transpose(0, 2, 1, 3).reshape(D, D)
            dxi = jnp.linalg.solve(Hd, -g.reshape(D)).reshape(F - 1, 6)
            drho = -(g_r + jnp.einsum("nfa,fa->n", B, dxi)) / h_r
            T_new = se3.exp_se3(dxi) @ T_stack
            rho_new = jnp.where(valid0, jnp.maximum(rho + drho, 1e-4), rho)
            F_new = objective(T_new, rho_new)
            pred_loc = 0.5 * jnp.sum(jnp.where(valid0, drho * (lam * drho - g_r), 0.0))
            pred = 0.5 * jnp.sum(dxi * (lam * dxi - g)) + jax.lax.psum(pred_loc, POINT_AXIS)
            accept = (F_new < Fv) & jnp.isfinite(F_new)
            gain = (Fv - F_new) / jnp.maximum(pred, 1e-20)
            lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * gain - 1.0) ** 3)
            T_stack = jnp.where(accept, T_new, T_stack)
            rho = jnp.where(accept, rho_new, rho)
            Fv = jnp.where(accept, F_new, Fv)
            lam = jnp.where(accept, lam_acc, lam * nu)
            nu = jnp.where(accept, 2.0, nu * 2.0)
            return (it + 1, T_stack, rho, Fv, lam, nu)

        def cond(state):
            return state[0] < p.iters

        _, T_fin, rho_fin, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), T0, rho0, F0, lam0, jnp.float32(2.0))
        )
        poses = jnp.concatenate([poses_init[:1], T_fin], axis=0)
        return poses, rho_fin

    return solve
