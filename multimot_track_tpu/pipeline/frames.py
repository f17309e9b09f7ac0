"""Per-frame observation tensors and frame-pair construction.

Functional replacement for the reference's ``Frame`` object plus the
correspondence-handoff logic in ``GrabImageRGBD`` (src/Tracking.cc:487-610):
the current frame inherits the last frame's flow-shifted positions
(``mvCorres``/``mvObjCorres``) so that index i in the pair refers to the
same physical point in both frames — here that handoff is a pure function
from (last FrameObservation, current images) to a ``PairInputs`` pytree.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimot_track_tpu.config import PipelineConfig
from multimot_track_tpu.frontend import fast, sampling
from multimot_track_tpu.geometry import camera


class GTTable(NamedTuple):
    """Ground-truth per-frame data, padded to k_obj_max entries."""

    Tcw: jnp.ndarray        # (4, 4) GT world->camera pose (normalised)
    obj_ids: jnp.ndarray    # (K,) int32 GT object ids (== mask labels)
    obj_L: jnp.ndarray      # (K, 4, 4) camera-frame object poses
    obj_valid: jnp.ndarray  # (K,) bool


class FrameObservation(NamedTuple):
    """A frame's own samples (reference mv*Tmp / mvObjKeys at construction)."""

    static: sampling.StaticSamples
    objects: sampling.ObjSamples
    gt: GTTable


class PairInputs(NamedTuple):
    """Everything the per-pair tracking step consumes.  Index i of every
    static (st_*) array refers to one physical background point observed in
    the last frame at ``st_uv`` and in the current frame at ``st_cur_uv``;
    likewise ob_* for dense object points."""

    st_uv: jnp.ndarray         # (Ns, 2) last-frame position
    st_flow: jnp.ndarray       # (Ns, 2) measured flow
    st_depth: jnp.ndarray      # (Ns,)   last-frame depth
    st_cur_uv: jnp.ndarray     # (Ns, 2) current position (= uv + flow)
    st_cur_depth: jnp.ndarray  # (Ns,)   current-frame depth at cur position
    st_valid: jnp.ndarray      # (Ns,) bool
    st_zncc: jnp.ndarray       # (Ns,) photometric flow-verification score:
    #                             ZNCC(last patch at uv, cur patch at uv+flow)

    ob_uv: jnp.ndarray         # (No, 2)
    ob_flow: jnp.ndarray       # (No, 2)
    ob_depth: jnp.ndarray      # (No,)
    ob_label_last: jnp.ndarray  # (No,) last frame's own semantic label
    ob_cur_uv: jnp.ndarray     # (No, 2)
    ob_cur_depth: jnp.ndarray  # (No,)
    ob_cur_label: jnp.ndarray  # (No,) semantic label at current position
    ob_valid: jnp.ndarray      # (No,) bool
    ob_patch: jnp.ndarray      # (No, P) last-frame intensity patch at ob_uv
    cur_gray: jnp.ndarray      # (H, W) current gray image — consumed by the
    #                             object-motion photometric consensus selector

    gt_last: GTTable
    gt_cur: GTTable


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_frame_observation(
    gray: jnp.ndarray,
    depth_raw: jnp.ndarray,
    flow: jnp.ndarray,
    sem_mask: jnp.ndarray,
    gt: GTTable,
    cfg: PipelineConfig,
    noise_key: jnp.ndarray = None,
) -> FrameObservation:
    """Run the frontend on one frame's images (device-side).

    When ``cfg.solver.depth_noise`` is set (and a key is given), Gaussian
    noise sigma = z^2/(725*0.5)*scale is injected into the depth image —
    the reference's synthetic robustness-study mechanism
    (src/Frame.cc:1089)."""
    cam = cfg.camera
    fe = cfg.frontend
    pad = cfg.padding
    depth = camera.disparity_png_to_depth(depth_raw, cam.bf)
    if cfg.solver.depth_noise and noise_key is not None:
        sigma = depth * depth / (725.0 * 0.5) * cfg.solver.depth_noise_scale
        noise = sigma * jax.random.normal(noise_key, depth.shape, depth.dtype)
        depth = jnp.where(depth > 0, jnp.maximum(depth + noise, 1e-3), depth)
    if cfg.solver.flow_outliers and noise_key is not None:
        # the reference's commented outlier-flow injector (Frame.cc:276-301):
        # a random pixel fraction gets large Gaussian flow offsets — the
        # mechanism the authors used to study robustness to flow corruption
        kh, km = jax.random.split(jax.random.fold_in(noise_key, 1))
        hit = (
            jax.random.uniform(kh, flow.shape[:2] + (1,))
            < cfg.solver.flow_outlier_frac
        )
        mag = jax.random.normal(km, flow.shape) * cfg.solver.flow_outlier_mag
        flow = jnp.where(hit, flow + mag, flow)
    kp = fast.detect_pyramid(
        gray,
        threshold=float(fe.fast_threshold),
        min_threshold=float(fe.fast_min_threshold),
        n_levels=fe.n_levels,
        scale_factor=fe.scale_factor,
        n_total=fe.n_features,
    )
    static = sampling.sample_static(
        kp.uv, kp.valid, depth, sem_mask, flow, gray,
        max_depth=fe.static_max_depth, n_max=pad.n_static_max,
        patch_radius=cfg.solver.zncc_patch_radius,
    )
    objects = sampling.sample_dense_objects(
        depth, sem_mask, flow, gray,
        step=fe.obj_sample_step, max_depth=fe.obj_max_depth,
        n_max=pad.n_obj_pts_max,
        patch_radius=cfg.solver.zncc_patch_radius,
    )
    return FrameObservation(static=static, objects=objects, gt=gt)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_pair(
    last: FrameObservation,
    cur_depth_raw: jnp.ndarray,
    cur_sem_mask: jnp.ndarray,
    gt_cur: GTTable,
    cfg: PipelineConfig,
    cur_gray: jnp.ndarray = None,
) -> PairInputs:
    """Correspondence handoff (src/Tracking.cc:487-610).

    Static: current positions are the last frame's flow-shifted corres;
    current depth is looked up at round(pos) when strictly inside the image,
    else the -1 sentinel (Tracking.cc:556-566).
    Objects: current depth/label looked up likewise; out-of-bounds points
    get depth 0.1 / label 0 (Tracking.cc:584-592).
    When ``cur_gray`` is given, each static correspondence additionally gets
    a photometric verification score (ops/photometric.zncc); without it the
    score is 1 (everything verifies — the reference's trusting behaviour).
    """
    cam = cfg.camera
    cur_depth = camera.disparity_png_to_depth(cur_depth_raw, cam.bf)

    st_cur_uv = last.static.corres
    st_d, st_inb = camera.nearest_sample(cur_depth, st_cur_uv)
    st_cur_depth = jnp.where(st_inb & (st_d > 0), st_d, -1.0)

    if cur_gray is None:
        st_zncc = jnp.ones(st_cur_uv.shape[0], jnp.float32)
    else:
        from multimot_track_tpu.ops import photometric

        cur_patch = photometric.extract_patches(
            cur_gray.astype(jnp.float32), st_cur_uv, cfg.solver.zncc_patch_radius
        )
        st_zncc = photometric.zncc(last.static.patch, cur_patch)

    ob_cur_uv = last.objects.corres
    ob_d, ob_inb = camera.nearest_sample(cur_depth, ob_cur_uv)
    ob_l, _ = camera.nearest_sample(cur_sem_mask, ob_cur_uv)
    ob_cur_depth = jnp.where(ob_inb, ob_d, 0.1)
    ob_cur_label = jnp.where(ob_inb, ob_l, 0)

    return PairInputs(
        st_uv=last.static.uv,
        st_flow=last.static.flow,
        st_depth=last.static.depth,
        st_cur_uv=st_cur_uv,
        st_cur_depth=st_cur_depth,
        st_valid=last.static.valid & (last.static.depth > 0),
        st_zncc=st_zncc,
        ob_uv=last.objects.uv,
        ob_flow=last.objects.flow,
        ob_depth=last.objects.depth,
        ob_label_last=last.objects.label,
        ob_cur_uv=ob_cur_uv,
        ob_cur_depth=ob_cur_depth,
        ob_cur_label=ob_cur_label,
        ob_valid=last.objects.valid,
        ob_patch=last.objects.patch,
        cur_gray=(
            cur_gray.astype(jnp.float32)
            if cur_gray is not None
            else jnp.zeros_like(cur_depth)
        ),
        gt_last=last.gt,
        gt_cur=gt_cur,
    )


def make_gt_table(pose_gt_raw, obj_ids, obj_poses, k_max: int, origin_inv=None):
    """Host-side: normalise GT pose (Tcw = inv(Twc_disk), src/Tracking.cc:615-624)
    and pad the object table."""
    import numpy as np

    Twc = np.asarray(pose_gt_raw, np.float32)
    R = Twc[:3, :3]
    t = Twc[:3, 3]
    Tcw = np.eye(4, dtype=np.float32)
    Tcw[:3, :3] = R.T
    Tcw[:3, 3] = -R.T @ t
    if origin_inv is not None:
        Tcw = Tcw @ np.asarray(origin_inv, np.float32)
    ids = np.zeros(k_max, np.int32)
    Ls = np.tile(np.eye(4, dtype=np.float32), (k_max, 1, 1))
    val = np.zeros(k_max, bool)
    m = min(len(obj_ids), k_max)
    if m:
        ids[:m] = np.asarray(obj_ids[:m], np.int32)
        Ls[:m] = np.asarray(obj_poses[:m], np.float32)
        val[:m] = True
    return GTTable(
        Tcw=jnp.asarray(Tcw),
        obj_ids=jnp.asarray(ids),
        obj_L=jnp.asarray(Ls),
        obj_valid=jnp.asarray(val),
    )
