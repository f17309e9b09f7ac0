"""Object motion solve diagnostics: locate the pipeline-vs-isolated gap.

  JAX_PLATFORMS=cpu python tools/diag_obj.py
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
from multimot_track_tpu.ops.photometric import extract_patches, zncc


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

    obj_params = FlowBAParams(
        reproj_info=sol.reproj_info, prior_info=sol.obj_flow_prior_info,
        rp_thres=sol.obj_rp_thres, iters=sol.obj_lm_iters, tau=sol.lm_tau,
    )

    key = jax.random.PRNGKey(0)
    for k in range(len(seq) - 1):
        fd_l, fd_c = fd_list[k], fd_list[k + 1]
        depth = np.clip(np.nan_to_num(fd_c.depth_raw), 0, 65535).astype(np.uint16)
        sem = np.clip(fd_c.sem_mask, 0, 255).astype(np.uint8)
        pair = F.build_pair(obs_list[k], jnp.asarray(depth), jnp.asarray(sem),
                            gt_list[k + 1], cfg,
                            cur_gray=jnp.asarray(fd_c.gray, jnp.float32))
        g_l = jnp.asarray(fd_l.gray, jnp.float32)
        g_c = jnp.asarray(fd_c.gray, jnp.float32)
        # use GT camera poses to isolate the object solve from camera error
        Tcw_last = pair.gt_last.Tcw
        Tcw_cur = pair.gt_cur.Tcw
        Twl = se3.inverse(Tcw_last)
        Twc_cur = se3.inverse(Tcw_cur)

        pt_ok = pair.ob_valid & (pair.ob_cur_label > 0) & (pair.ob_label_last > 0)
        labels = np.unique(np.asarray(pair.ob_cur_label)[np.asarray(pt_ok)])
        labels = [l for l in labels if l > 0]
        Xp_w = se3.transform(Twl, camera.backproject(pair.ob_uv, pair.ob_depth, fx, fy, cx, cy))
        xyz_cur = camera.backproject(pair.ob_cur_uv, pair.ob_cur_depth, fx, fy, cx, cy)

        # photometric score for object points
        s_ob = zncc(extract_patches(g_l, pair.ob_uv, 2),
                    extract_patches(g_c, pair.ob_cur_uv, 2))

        for lab in labels:
            memb = pt_ok & (pair.ob_cur_label == int(lab))
            n = int(jnp.sum(memb))
            if n < 100:
                continue
            # GT motion for this label
            def gt_lookup(tab, Twc_gt):
                hit = np.asarray(tab.obj_valid & (tab.obj_ids == int(lab)))
                if not hit.any():
                    return None
                idx = int(np.argmax(hit))
                return np.asarray(Twc_gt @ tab.obj_L[idx])
            L_p = gt_lookup(pair.gt_last, se3.inverse(pair.gt_last.Tcw))
            L_c = gt_lookup(pair.gt_cur, se3.inverse(pair.gt_cur.Tcw))
            if L_p is None or L_c is None:
                continue
            H_gt = L_c @ np.linalg.inv(L_p)

            sw = np.asarray(memb, np.float32)
            centre = np.asarray(jnp.sum(Xp_w * jnp.asarray(sw)[:, None], 0) / sw.sum())

            def obj_rpe(P):
                H_est = np.asarray(Twc_cur) @ np.asarray(P)
                m = metrics.object_motion_error(
                    jnp.asarray(H_est), jnp.asarray(H_gt), jnp.asarray(centre),
                    jnp.asarray(L_p[:3, 3]), jnp.asarray(L_c[:3, 3]))
                return float(m.t_rel) * 100

            def solve(subset, T0):
                r = solve_flow_ba(T0, Twl, pair.ob_uv, pair.ob_flow,
                                  pair.ob_depth, subset, fx, fy, cx, cy,
                                  params=obj_params)
                return r

            kk = jax.random.fold_in(key, k * 10 + int(lab))
            rrk = ransac.ransac_rigid_pose(
                kk, Xp_w, pair.ob_cur_uv, xyz_cur, memb, fx, fy, cx, cy,
                thresh=sol.ransac_reproj_px, iters=sol.obj_ransac_iters,
                refine_iters=sol.refine_gn_iters)

            # pipeline-equivalent: solve on RANSAC inliers
            A = solve(rrk.inliers, rrk.T)
            # all members
            B = solve(memb, rrk.T)
            # GT init
            P_gt = np.asarray(Tcw_cur) @ H_gt     # pose s.t. H = Twc_cur @ P
            C = solve(rrk.inliers, jnp.asarray(P_gt, jnp.float32))
            D = solve(memb, jnp.asarray(P_gt, jnp.float32))
            # zncc-gated members
            mz = memb & (s_ob > 0.9)
            E = solve(mz, rrk.T)
            # zncc + ransac inliers
            Fv = solve(mz & rrk.inliers, rrk.T)
            nz = int(jnp.sum(mz))
            # R: the pipeline's reclassify rounds applied to A
            Rv = A
            for _ in range(sol.obj_reclassify_rounds):
                regate = memb & (Rv.chi2 <= sol.obj_rp_thres)
                if int(jnp.sum(regate)) >= 10:
                    Rv = solve(regate, Rv.T)

            # --- photometric consensus selector: project members through
            # each candidate motion and ZNCC the current patches against
            # the last-frame patches — a flow-independent witness of which
            # solution is physically right ---
            p_last = extract_patches(g_l, pair.ob_uv, 2)

            def photo_consensus(P):
                Xc = se3.transform(jnp.asarray(P, jnp.float32), Xp_w)
                uvp = camera.project(Xc, fx, fy, cx, cy)
                pc = extract_patches(g_c, uvp, 2)
                sp = zncc(p_last, pc)
                return float(jnp.sum(((sp > 0.8) & memb).astype(jnp.int32)))

            cands = {"A": A.T, "B": B.T, "E": E.T, "R": Rv.T}
            scores = {nm: photo_consensus(P) for nm, P in cands.items()}
            best = max(scores, key=scores.get)
            print(f"pair {k}->{k+1} label {lab}: n={n} nz={nz} "
                  f"ransac_inl={int(rrk.n_inliers)} "
                  f"| A inl {obj_rpe(A.T):6.2f} B all {obj_rpe(B.T):6.2f} "
                  f"C gt-init-inl {obj_rpe(C.T):6.2f} D gt-init-all {obj_rpe(D.T):6.2f} "
                  f"E zncc {obj_rpe(E.T):6.2f} F zncc+inl {obj_rpe(Fv.T):6.2f} "
                  f"R reclass {obj_rpe(Rv.T):6.2f} "
                  f"| init {obj_rpe(rrk.T):6.2f} "
                  f"| photo-pick {best} -> {obj_rpe(cands[best]):6.2f} "
                  f"(scores {dict((kk, int(vv)) for kk, vv in scores.items())})")


if __name__ == "__main__":
    main()
