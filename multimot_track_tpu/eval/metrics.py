"""Online ground-truth evaluation — the reference's de-facto test suite
(SURVEY.md §4): per-frame camera relative pose error, per-object motion RPE,
speed error, flow-error histograms.  Formula-level replication of
src/Tracking.cc:1322-1345 (camera) and :2199-2248 (objects)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from multimot_track_tpu.geometry import se3


class PoseRPE(NamedTuple):
    t_abs: jnp.ndarray    # translation error magnitude (m)
    r_abs: jnp.ndarray    # rotation error (deg)
    t_rel: jnp.ndarray    # t_abs / ||t_gt||  (printed as %)
    r_rel: jnp.ndarray    # r_abs / ||t_gt||  (deg/m)


def camera_rpe(
    Tcw_cur: jnp.ndarray,
    Tcw_last: jnp.ndarray,
    Tcw_gt_cur: jnp.ndarray,
    Tcw_gt_last: jnp.ndarray,
) -> PoseRPE:
    """RePoEr = (Tcw_cur Twc_last_est) (Tcw_gt_last Twc_gt_cur)
    — exactly src/Tracking.cc:1325-1345."""
    T_lc_inv = Tcw_cur @ se3.inverse(Tcw_last)
    T_lc_gt = Tcw_gt_last @ se3.inverse(Tcw_gt_cur)
    E = T_lc_inv @ T_lc_gt
    t_abs = jnp.linalg.norm(E[..., :3, 3], axis=-1)
    r_abs = se3.rotation_angle_deg(E[..., :3, :3])
    t_gt = jnp.linalg.norm(T_lc_gt[..., :3, 3], axis=-1)
    return PoseRPE(t_abs, r_abs, t_abs / t_gt, r_abs / t_gt)


class ObjMotionErr(NamedTuple):
    t_abs: jnp.ndarray
    r_abs: jnp.ndarray
    t_rel: jnp.ndarray
    r_rel: jnp.ndarray
    speed_est: jnp.ndarray    # km/h
    speed_gt: jnp.ndarray     # km/h
    speed_err_rel: jnp.ndarray  # |est - gt| / gt
    # centroid-anchored translation error: the motion of the point AT THE
    # OBJECT, |(t - (I-R) c) - d_gt| / |d_gt|.  The reference's E-metric
    # translation (t_rel above) anchors at the WORLD ORIGIN, so a small
    # rotation error couples through an |origin - object| lever arm — on
    # long trajectories (object tens of metres from origin) that term
    # dominates and measures anchor distance, not solve quality.
    t_abs_centred: jnp.ndarray
    t_rel_centred: jnp.ndarray


def object_motion_error(
    H_est: jnp.ndarray,       # (4,4) estimated world-frame object motion (vObjMod)
    H_gt: jnp.ndarray,        # (4,4) ground-truth world-frame motion H_p_c
    centre_pre: jnp.ndarray,  # (3,) object centroid in world at last frame
    L_w_p_t: jnp.ndarray,     # (3,) GT object position (world) last frame
    L_w_c_t: jnp.ndarray,     # (3,) GT object position (world) current frame
) -> ObjMotionErr:
    """Reference metric (1) "old proposed": E = H_est^-1 H_gt
    (src/Tracking.cc:2218-2248); speed per :2178-2197."""
    E = se3.inverse(H_est) @ H_gt
    t_abs = jnp.linalg.norm(E[..., :3, 3], axis=-1)
    r_abs = se3.rotation_angle_deg(E[..., :3, :3])
    t_gt = jnp.linalg.norm(H_gt[..., :3, 3], axis=-1)

    sp_gt = jnp.linalg.norm(L_w_p_t - L_w_c_t, axis=-1)
    R = H_est[..., :3, :3]
    t = H_est[..., :3, 3]
    sp_est_v = t - jnp.einsum(
        "...ij,...j->...i", jnp.eye(3, dtype=H_est.dtype) - R, centre_pre
    )
    sp_est = jnp.linalg.norm(sp_est_v, axis=-1)
    d_gt = L_w_c_t - L_w_p_t
    t_cen = jnp.linalg.norm(sp_est_v - d_gt, axis=-1)
    return ObjMotionErr(
        t_abs=t_abs,
        r_abs=r_abs,
        t_rel=t_abs / t_gt,
        r_rel=r_abs / t_gt,
        speed_est=sp_est * 36.0,   # m/0.1s -> km/h (Tracking.cc:2192)
        speed_gt=sp_gt * 36.0,
        speed_err_rel=jnp.abs(sp_est - sp_gt) / jnp.maximum(sp_gt, 1e-12),
        t_abs_centred=t_cen,
        t_rel_centred=t_cen / jnp.maximum(jnp.linalg.norm(d_gt, axis=-1), 1e-12),
    )


class SegConfusion(NamedTuple):
    tot: jnp.ndarray   # GT-dynamic points in total
    fp: jnp.ndarray    # predicted dynamic but GT static
    fn: jnp.ndarray    # predicted static/outlier but GT dynamic
    nd: jnp.ndarray    # GT-dynamic not detected at all (label -1/-2)


def segmentation_confusion(
    pred_label: jnp.ndarray,    # (N,) -2 unproc / -1 outlier / 0 static / k>=1
    sem_label: jnp.ndarray,     # (N,) instance labels at current positions
    gt_dynamic_ids: jnp.ndarray,  # (K,) instance ids that truly move
    gt_dynamic_valid: jnp.ndarray,  # (K,)
    valid: jnp.ndarray,
) -> SegConfusion:
    """Motion-segmentation misclassification accounting — the reference's
    ``coer`` out-params tot/fp/fn/nd (src/System.cc:169-171,
    src/Tracking.cc:656-659; computation commented at :2269-2453)."""
    is_gt_dyn = jnp.any(
        (sem_label[:, None] == gt_dynamic_ids[None, :]) & gt_dynamic_valid[None, :],
        axis=1,
    ) & valid
    pred_dyn = (pred_label >= 1) & valid
    pred_static = (pred_label == 0) & valid
    undetected = (pred_label < 0) & valid
    tot = jnp.sum(is_gt_dyn.astype(jnp.int32))
    fp = jnp.sum((pred_dyn & ~is_gt_dyn).astype(jnp.int32))
    fn = jnp.sum((pred_static & is_gt_dyn).astype(jnp.int32))
    nd = jnp.sum((undetected & is_gt_dyn).astype(jnp.int32))
    return SegConfusion(tot=tot, fp=fp, fn=fn, nd=nd)


def absolute_trajectory_error(
    est_Twc: jnp.ndarray,   # (M, 4, 4) estimated camera-to-world poses
    gt_Twc: jnp.ndarray,    # (M, 4, 4) ground-truth camera-to-world poses
    align: bool = True,
    with_scale: bool = False,
):
    """ATE-RMSE after rigid (Umeyama) trajectory alignment — the KITTI/TUM
    evaluation convention the BASELINE targets alongside RPE.

    ``with_scale=True`` additionally solves the similarity scale — the
    standard convention for monocular (up-to-scale) trajectories.
    Returns (rmse, per-frame position errors).
    """
    from multimot_track_tpu.solvers.sim3 import umeyama

    p_est = est_Twc[:, :3, 3]
    p_gt = gt_Twc[:, :3, 3]
    if align:
        s, R, t = umeyama(p_est[None], p_gt[None], with_scale=with_scale)
        p_al = s[0] * jnp.einsum("ij,nj->ni", R[0], p_est) + t[0]
    else:
        p_al = p_est
    err = jnp.linalg.norm(p_al - p_gt, axis=-1)
    return jnp.sqrt(jnp.mean(err**2)), err


def flow_error_histogram(err: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """20-bin histogram of static-point flow error magnitudes, bin edges as in
    src/Tracking.cc:1231-1274 (0.5 px bins to 9, then [9,10), [10,inf))."""
    edges = jnp.concatenate(
        [jnp.arange(0.0, 9.5, 0.5), jnp.asarray([10.0, jnp.inf])]
    )
    idx = jnp.clip(jnp.searchsorted(edges, err, side="right") - 1, 0, 19)
    return jnp.zeros(20, jnp.int32).at[idx].add(valid.astype(jnp.int32))
