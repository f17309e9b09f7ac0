"""Diagnose the +~2% translation-scale bias of the online camera solve.

PARITY.md: estimated per-pair displacements are smooth 1.244-1.264 m while
GT averages 1.23 m.  Hypothesis: provided-disparity depth is convexity-
biased (E[bf/d] > bf/E[d]) and the bias grows with depth, stretching the
translation.  Test: solve each pair with depth-restricted point subsets —
if near-only solves shrink toward GT scale, depth-variance weighting is
the principled fix (the reference's own noise model sigma_z ~ z^2).

  python tools/diag_scale_bias.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline import frames as F
from multimot_track_tpu.pipeline import tracker
from multimot_track_tpu.solvers.flow_ba import FlowBAParams, solve_flow_ba


def main():
    cfg = DEFAULT_CONFIG
    cam = cfg.camera
    sol = cfg.solver
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    seq = KittiSequence("/root/reference/kitti_sample")
    K = cfg.padding.k_obj_max

    obs_list, gt_list, fd_list = [], [], []
    for i in range(len(seq)):
        fd = seq.load_frame(i)
        fd_list.append(fd)
        gt = F.make_gt_table(fd.pose_gt, fd.obj_ids_gt, fd.obj_poses_gt, K)
        gt_list.append(gt)
        gray = np.clip(np.nan_to_num(np.round(fd.gray)), 0, 255).astype(np.uint8)
        depth = np.clip(np.nan_to_num(fd.depth_raw), 0, 65535).astype(np.uint16)
        flow = np.clip(np.nan_to_num(fd.flow * 128.0), -32767, 32767).astype(np.int16)
        sem = np.clip(fd.sem_mask, 0, 255).astype(np.uint8)
        obs_list.append(tracker.first_step(gray, depth, flow, sem, gt, cfg))

    cam_params = FlowBAParams(
        reproj_info=sol.reproj_info, prior_info=sol.cam_flow_prior_info,
        rp_thres=sol.cam_rp_thres, iters=sol.cam_lm_iters, tau=sol.lm_tau,
    )
    eye = jnp.eye(4)

    variants = [
        ("all", lambda d: d > 0),
        ("z<20", lambda d: (d > 0) & (d < 20)),
        ("z<12", lambda d: (d > 0) & (d < 12)),
        ("z>15", lambda d: d > 15),
    ]

    print(f"{'pair':5} {'GT':>7} " + " ".join(f"{n:>8}" for n, _ in variants))
    for k in range(len(seq) - 1):
        fd_c = fd_list[k + 1]
        depth = np.clip(np.nan_to_num(fd_c.depth_raw), 0, 65535).astype(np.uint16)
        sem = np.clip(fd_c.sem_mask, 0, 255).astype(np.uint8)
        pair = F.build_pair(obs_list[k], jnp.asarray(depth), jnp.asarray(sem),
                            gt_list[k + 1], cfg,
                            cur_gray=jnp.asarray(fd_c.gray, jnp.float32))
        # GT relative displacement
        T_rel_gt = np.asarray(pair.gt_cur.Tcw @ se3.inverse(pair.gt_last.Tcw))
        d_gt = np.linalg.norm(np.linalg.inv(T_rel_gt)[:3, 3])

        st_phot = pair.st_valid & (pair.st_zncc > sol.zncc_min)
        n_phot = int(jnp.sum(st_phot.astype(jnp.int32)))
        base = st_phot if n_phot >= sol.min_gated_static else pair.st_valid

        row = []
        for name, gate in variants:
            subset = base & gate(pair.st_depth)
            # forward solve (Twl = I: last frame is the world)
            res_f = solve_flow_ba(eye, eye, pair.st_uv, pair.st_flow,
                                  pair.st_depth, subset, fx, fy, cx, cy,
                                  params=cam_params)
            # backward solve anchored on current depth
            bwd_sub = subset & (pair.st_cur_depth > 0) & gate(
                jnp.where(pair.st_cur_depth > 0, pair.st_cur_depth, 1e9))
            res_b = solve_flow_ba(se3.inverse(res_f.T), eye, pair.st_cur_uv,
                                  -pair.st_flow, pair.st_cur_depth, bwd_sub,
                                  fx, fy, cx, cy, params=cam_params)
            xi = 0.5 * (se3.log_se3(res_f.T) + se3.log_se3(se3.inverse(res_b.T)))
            T_rel = np.asarray(se3.exp_se3(xi))
            d_est = np.linalg.norm(np.linalg.inv(T_rel)[:3, 3])
            n_sub = int(jnp.sum(subset.astype(jnp.int32)))
            row.append((d_est, n_sub))
        print(f"{k}->{k+1} {d_gt:7.3f} " + " ".join(
            f"{d:6.3f}/{n:<5d}"[:8].ljust(8) for d, n in row))
        fwd_depths = np.asarray(pair.st_depth)[np.asarray(base)]
        print(f"      depth dist: med {np.median(fwd_depths):.1f} "
              f"p25 {np.percentile(fwd_depths,25):.1f} p75 {np.percentile(fwd_depths,75):.1f}")


if __name__ == "__main__":
    main()
