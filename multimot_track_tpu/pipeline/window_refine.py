"""Trailing-window trajectory refinement inside the live system.

The reference continuously refines its keyframe window in a background
thread (``LocalMapping::Run`` -> ``Optimizer::LocalBundleAdjustment``,
src/LocalMapping.cc:48, src/Optimizer.cc:3341).  The TPU-native analog is
one fused device program per frame: detect keypoints on the window's
first frame, chain them through the stored dense flow fields
(frontend/tracks.chain_tracks), and run the inverse-depth windowed BA
(solvers/window_ba) initialised at the online per-pair poses.  The system
keeps the window's compact image tensors resident on device (they were
uploaded for ``full_step`` anyway), so refinement costs zero extra
host<->device traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from multimot_track_tpu.config import PipelineConfig
from multimot_track_tpu.frontend import fast, tracks
from multimot_track_tpu.geometry import camera
from multimot_track_tpu.solvers.window_ba import WindowBAParams, solve_window_ba


@functools.partial(jax.jit, static_argnames=("cfg",))
def refine_trailing_window(
    poses_rel: jnp.ndarray,     # (W, 4, 4) Tcw relative to window frame 0 (I)
    grays_u8: jnp.ndarray,      # (W, H, W) window gray frames
    depth0_u16: jnp.ndarray,    # (H, W) first window frame raw depth png
    flows_i16: jnp.ndarray,     # (W-1, H, W, 2) dense flow k -> k+1, *128
    sems_u8: jnp.ndarray,       # (W, H, W) instance masks
    cfg: PipelineConfig,
):
    """Returns (refined poses (W, 4, 4), n_live_tracks)."""
    from multimot_track_tpu.ops import photometric

    be = cfg.backend
    grays = grays_u8.astype(jnp.float32)
    gray0 = grays[0]
    depth0 = camera.disparity_png_to_depth(
        depth0_u16.astype(jnp.float32), cfg.camera.bf
    )
    flows = flows_i16.astype(jnp.float32) * (1.0 / 128.0)
    sems = sems_u8.astype(jnp.int32)

    kp = fast.detect_pyramid(gray0, n_levels=4, n_total=be.n_window_tracks)
    z0, _ = camera.nearest_sample(depth0, kp.uv)
    lab0, _ = camera.nearest_sample(sems[0], kp.uv)
    valid0 = kp.valid & (z0 > 0) & (z0 < 40.0) & (lab0 == 0)

    tr = tracks.chain_tracks(kp.uv, valid0, flows, sems)
    # photometric verification of every chained observation against the
    # frame-0 patch: the strictest selection — only drift-free tracks
    # survive.  The KLT re-centering variant (tracks.chain_tracks_zncc)
    # more than doubles survival but admits noisier measurements and
    # measured WORSE on the refined RPE (5.7% vs 4.8% on kitti_sample);
    # with the odometry-prior fusion the BA prefers few clean tracks.
    r = cfg.solver.zncc_patch_radius
    p0 = photometric.extract_patches(gray0, kp.uv, r)

    def verify(alive_f, uv_f, gray_f):
        pf = photometric.extract_patches(gray_f, uv_f, r)
        return alive_f & (photometric.zncc(p0, pf) > be.window_zncc_min)

    alive_v = jax.vmap(verify)(tr.alive[1:], tr.uv[1:], grays[1:])
    alive_v = jnp.cumprod(alive_v.astype(jnp.int32), axis=0).astype(bool)
    alive = jnp.concatenate([tr.alive[:1], alive_v], axis=0)

    res = solve_window_ba(
        poses_rel, tr.uv, alive, z0,
        cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
        params=WindowBAParams(
            iters=be.window_ba_iters, odo_prior_weight=be.odo_prior_weight
        ),
    )
    n_live = jnp.sum(alive[-1].astype(jnp.int32))
    return res.poses, n_live
