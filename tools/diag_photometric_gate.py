"""Photometric-consistency gate for flow correspondences (dev tool).

For each static point, compare a patch around uv in the last gray image
with the patch around uv+flow in the current gray image (ZNCC).  Points
whose flow is wrong fail the check -> drop them from the camera solve.

  JAX_PLATFORMS=cpu python tools/diag_ego5.py
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
from multimot_track_tpu.solvers import ransac
from multimot_track_tpu.solvers.flow_ba import FlowBAParams, solve_flow_ba


def patch_stack(gray, uv, r):
    """(N, (2r+1)^2) bilinear patches around uv."""
    dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij")
    offs = jnp.stack([dx.reshape(-1), dy.reshape(-1)], -1).astype(jnp.float32)  # (P,2)
    pos = uv[:, None, :] + offs[None, :, :]          # (N, P, 2)
    H, W = gray.shape
    x = jnp.clip(pos[..., 0], 0.0, W - 1.001)
    y = jnp.clip(pos[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = x - x0
    wy = y - y0
    g = lambda yy, xx: gray[yy, xx]
    v = (
        g(y0, x0) * (1 - wx) * (1 - wy)
        + g(y0, x0 + 1) * wx * (1 - wy)
        + g(y0 + 1, x0) * (1 - wx) * wy
        + g(y0 + 1, x0 + 1) * wx * wy
    )
    return v


def zncc(pa, pb):
    ma = pa.mean(-1, keepdims=True)
    mb = pb.mean(-1, keepdims=True)
    a = pa - ma
    b = pb - mb
    num = (a * b).sum(-1)
    den = jnp.sqrt((a * a).sum(-1) * (b * b).sum(-1)) + 1e-6
    return num / den


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

    key = jax.random.PRNGKey(0)
    table = {}
    for k in range(len(seq) - 1):
        fd_l, fd_c = fd_list[k], fd_list[k + 1]
        depth = np.clip(np.nan_to_num(fd_c.depth_raw), 0, 65535).astype(np.uint16)
        sem = np.clip(fd_c.sem_mask, 0, 255).astype(np.uint8)
        pair = F.build_pair(obs_list[k], jnp.asarray(depth), jnp.asarray(sem),
                            gt_list[k + 1], cfg)
        Tcw_last = pair.gt_last.Tcw
        Twl = se3.inverse(Tcw_last)
        g_l = jnp.asarray(fd_l.gray, jnp.float32)
        g_c = jnp.asarray(fd_c.gray, jnp.float32)

        Xw = se3.transform(Twl, camera.backproject(pair.st_uv, pair.st_depth, fx, fy, cx, cy))
        xyz_cur = camera.backproject(pair.st_cur_uv, pair.st_cur_depth, fx, fy, cx, cy)
        st_ok = pair.st_valid & (pair.st_cur_depth > 0)
        kk = jax.random.fold_in(key, k)
        rr = ransac.ransac_rigid_pose(
            kk, Xw, pair.st_cur_uv, xyz_cur, st_ok, fx, fy, cx, cy,
            thresh=sol.ransac_reproj_px, iters=sol.ransac_iters,
            refine_iters=sol.refine_gn_iters,
        )

        def rpe(T):
            m = metrics.camera_rpe(T, Tcw_last, pair.gt_cur.Tcw, pair.gt_last.Tcw)
            return float(m.t_rel) * 100

        def solve(T0, subset):
            return solve_flow_ba(T0, Twl, pair.st_uv, pair.st_flow,
                                 pair.st_depth, subset, fx, fy, cx, cy,
                                 params=cam_params)

        A = solve(rr.T, pair.st_valid)
        table.setdefault("A base", []).append(rpe(A.T))

        for r in (2, 3):
            pa = patch_stack(g_l, pair.st_uv, r)
            pb = patch_stack(g_c, pair.st_cur_uv, r)
            score = zncc(pa, pb)
            for thr in (0.5, 0.7, 0.85):
                m = pair.st_valid & (score > thr)
                res = solve(rr.T, m)
                # also iterate inlier-resolve once on the gated set
                res2 = solve(res.T, m & res.inliers)
                nm = f"zncc r{r} t{thr}"
                table.setdefault(nm, []).append(rpe(res.T))
                table.setdefault(nm + "+inl", []).append(rpe(res2.T))
                if k == 0:
                    pass
        # report gate population once per pair
        pa = patch_stack(g_l, pair.st_uv, 3)
        pb = patch_stack(g_c, pair.st_cur_uv, 3)
        score = zncc(pa, pb)
        v = np.asarray(pair.st_valid)
        s = np.asarray(score)
        print(f"pair {k}->{k+1}: n={v.sum()} zncc>0.5:{(v & (s>0.5)).sum()} "
              f">0.7:{(v & (s>0.7)).sum()} >0.85:{(v & (s>0.85)).sum()}")

    print(f"\n{'variant':>18s}  " + "  ".join(f"{k}->{k+1}" for k in range(4)) + "   mean")
    for nm, vals in table.items():
        print(f"{nm:>18s}  " + "  ".join(f"{x:4.2f}" for x in vals) +
              f"   {np.mean(vals):.2f}")


if __name__ == "__main__":
    main()
