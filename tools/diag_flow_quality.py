"""Third-stage diagnostics: where is the flow biased, and does weighting
or gating by flow agreement fix the camera solve?

  JAX_PLATFORMS=cpu python tools/diag_ego3.py
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
from multimot_track_tpu.eval import metrics
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

    for k in range(len(seq) - 1):
        fd_cur = fd_list[k + 1]
        depth = np.clip(np.nan_to_num(fd_cur.depth_raw), 0, 65535).astype(np.uint16)
        sem = np.clip(fd_cur.sem_mask, 0, 255).astype(np.uint8)
        pair = F.build_pair(obs_list[k], jnp.asarray(depth), jnp.asarray(sem),
                            gt_list[k + 1], cfg)
        Tcw_last = pair.gt_last.Tcw
        Twl = se3.inverse(Tcw_last)
        gt_T = pair.gt_cur.Tcw

        valid = np.asarray(pair.st_valid)
        z = np.asarray(pair.st_depth)
        uv = np.asarray(pair.st_uv)
        Xw = se3.transform(Twl, camera.backproject(pair.st_uv, pair.st_depth, fx, fy, cx, cy))
        uv_gt = np.asarray(camera.project(se3.transform(gt_T, Xw), fx, fy, cx, cy))
        flow_gt = uv_gt - uv
        flow_meas = np.asarray(pair.st_flow)
        ferr = flow_meas - flow_gt
        fmag = np.linalg.norm(ferr, axis=-1)

        print(f"\npair {k}->{k+1}:")
        for zlim in [(0, 15), (15, 25), (25, 40)]:
            m = valid & (z > zlim[0]) & (z <= zlim[1])
            if m.sum() == 0:
                continue
            print(f"  z {zlim}: n={m.sum():5d} |ferr| median={np.median(fmag[m]):.2f}px "
                  f"mean={fmag[m].mean():.2f}  bias u={ferr[m,0].mean():+.2f} "
                  f"v={ferr[m,1].mean():+.2f}  |flow| median={np.median(np.linalg.norm(flow_meas[m],axis=-1)):.1f}px")
        # v-bands (image rows): road vs sky-line
        for vlim in [(0, 150), (150, 250), (250, 375)]:
            m = valid & (uv[:, 1] > vlim[0]) & (uv[:, 1] <= vlim[1])
            if m.sum() == 0:
                continue
            print(f"  v {vlim}: n={m.sum():5d} |ferr| median={np.median(fmag[m]):.2f}px "
                  f"bias u={ferr[m,0].mean():+.2f} v={ferr[m,1].mean():+.2f}")

        def rpe(T):
            m = metrics.camera_rpe(T, Tcw_last, pair.gt_cur.Tcw, pair.gt_last.Tcw)
            return float(m.t_rel) * 100

        def solve(subset, params=cam_params):
            return solve_flow_ba(gt_T, Twl, pair.st_uv, pair.st_flow,
                                 pair.st_depth, subset, fx, fy, cx, cy,
                                 params=params)

        # gate points whose measured flow disagrees strongly with flow under
        # a preliminary solve (non-oracle two-stage)
        pre = solve(pair.st_valid)
        uv_pre = np.asarray(camera.project(se3.transform(pre.T, Xw), fx, fy, cx, cy))
        d_pre = np.linalg.norm(flow_meas - (uv_pre - uv), axis=-1)
        for gate in [1.0, 2.0, 3.0]:
            m = valid & (d_pre < gate)
            r = solve(jnp.asarray(m))
            print(f"  two-stage gate {gate}px: n={m.sum():5d} rpe={rpe(r.T):6.2f}%")
        # oracle check: gate by TRUE flow error
        for gate in [1.0, 2.0]:
            m = valid & (fmag < gate)
            r = solve(jnp.asarray(m))
            print(f"  oracle |ferr|<{gate}px: n={m.sum():5d} rpe={rpe(r.T):6.2f}%")


if __name__ == "__main__":
    main()
