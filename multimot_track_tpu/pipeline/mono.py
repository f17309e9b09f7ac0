"""Monocular ego-only visual odometry (the reference's mono drivers'
capability: Examples/Monocular/mono_kitti.cc + MonocularInitialization /
CreateInitialMapMonocular src/Tracking.cc:2583-2830).

Pipeline per frame: FAST + ORB describe; two-view bootstrap with the H/F
initializer (up-to-scale); afterwards descriptor matching against the
previous frame's triangulated points + RANSAC PnP, then re-triangulation
with scale propagated from the previous structure (median-depth ratio —
the reference fixes scale with the initial median depth the same way).
All per-frame compute is jitted; only the scale bookkeeping is host-side.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import DEFAULT_CONFIG, PipelineConfig
from multimot_track_tpu.frontend import fast, orb
from multimot_track_tpu.geometry import camera
from multimot_track_tpu.ops import matching
from multimot_track_tpu.solvers import pnp
from multimot_track_tpu.solvers.initializer import initialize_mono, triangulate


@dataclasses.dataclass
class MonoState:
    uv: np.ndarray          # (N, 2) keypoints of the last frame
    desc: np.ndarray        # (N, 256)
    valid: np.ndarray       # (N,)
    Xw: Optional[np.ndarray]  # (N, 3) world points (None until bootstrap)
    Xw_valid: Optional[np.ndarray]
    Tcw: np.ndarray         # (4, 4)


class MonoTracker:
    """Monocular tracker WITH the full backend ladder (the reference mono
    examples inherit the complete ORB-SLAM2 backend — keyframes, local
    mapping, loop closing, relocalization — src/System.cc:34-116 spawns
    LocalMapping/LoopClosing for every sensor): keyframe insertion into a
    sensor-agnostic KeyframeStore, per-frame local-map refinement (pure
    reprojection GN — the disparity rows self-disable at z=0),
    relocalization on PnP failure, and fix_scale=False Sim3 loop closing
    that measures + redistributes monocular scale drift
    (src/LoopClosing.cc:233 mbFixScale)."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG, n_kp: int = 1024,
                 seed: int = 0, enable_backend: bool = True,
                 keyframe_gap: int = 5, loop_min_matches: int = 40,
                 loop_min_kf_separation: int = 3):
        self.cfg = cfg
        self.n_kp = n_kp
        self.key = jax.random.PRNGKey(seed)
        self.state: Optional[MonoState] = None
        self.poses: List[np.ndarray] = []     # Tcw per frame
        self.initialized = False
        self._frame = 0
        self.loop_events: List[tuple] = []
        self.n_relocalizations = 0
        self.n_lost_frames = 0
        # constant-velocity motion model (TrackWithMotionModel,
        # src/Tracking.cc): per-frame relative Tcw, identity until tracked
        self._velocity = np.eye(4, dtype=np.float32)
        self.loop_min_matches = loop_min_matches
        self.loop_min_kf_separation = loop_min_kf_separation
        if enable_backend:
            from multimot_track_tpu.pipeline.keyframes import KeyframeStore

            self.keyframes = KeyframeStore(
                capacity=cfg.backend.kf_capacity, min_gap=keyframe_gap
            )
        else:
            self.keyframes = None

    def _frontend(self, gray: np.ndarray):
        g = jnp.asarray(gray)
        kp = fast.detect_pyramid(
            g,
            threshold=float(self.cfg.frontend.fast_threshold),
            min_threshold=float(self.cfg.frontend.fast_min_threshold),
            n_levels=4,
            n_total=self.n_kp,
        )
        desc, ang = orb.describe(g, kp.uv)
        uv = kp.uv
        cam = self.cfg.camera
        if cam.has_distortion:
            # describe on the raw (distorted) image at the detected pixel,
            # undistort only the coordinate used for geometry — exactly the
            # reference's mvKeys / mvKeysUn split (Frame::UndistortKeyPoints,
            # src/Frame.cc:787-811).  Needed for TUM/EuRoC mono lenses.
            uv = camera.undistort_points(
                uv, cam.fx, cam.fy, cam.cx, cam.cy,
                cam.k1, cam.k2, cam.p1, cam.p2, cam.k3,
            )
        return np.asarray(uv), np.asarray(desc), np.asarray(kp.valid)

    def track(self, gray: np.ndarray) -> np.ndarray:
        """Feed a frame; returns the current Tcw estimate."""
        cam = self.cfg.camera
        fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
        uv, desc, valid = self._frontend(gray)
        key = jax.random.fold_in(self.key, self._frame)
        self._frame += 1

        if self.state is None:
            self.state = MonoState(uv, desc, valid, None, None, np.eye(4, dtype=np.float32))
            self.poses.append(np.eye(4, dtype=np.float32))
            return self.poses[-1]

        st = self.state
        m = matching.match_descriptors(
            jnp.asarray(st.desc), jnp.asarray(desc),
            jnp.asarray(st.valid), jnp.asarray(valid),
        )
        uv_prev = st.uv
        uv_cur = uv[np.asarray(m.idx)]
        mvalid = np.asarray(m.valid)

        if not self.initialized:
            res = initialize_mono(
                key, jnp.asarray(uv_prev), jnp.asarray(uv_cur.astype(np.float32)),
                jnp.asarray(mvalid), fx, fy, cx, cy,
            )
            if not bool(res.ok):
                # keep waiting for enough parallax (reference re-tries too)
                self.state = MonoState(uv, desc, valid, None, None, st.Tcw)
                self.poses.append(st.Tcw)
                return st.Tcw
            self.initialized = True
            T21 = np.array(res.T21)  # writable copy
            # normalise scale: median scene depth = 1 (reference scales the
            # initial map by median depth, Tracking.cc CreateInitialMap)
            X = np.asarray(res.points3d)
            inl = np.asarray(res.inliers)
            med = np.median(X[inl, 2]) if inl.any() else 1.0
            X = X / max(med, 1e-6)
            T21[:3, 3] /= max(med, 1e-6)
            Tcw = T21 @ st.Tcw
            # carry world points on the CURRENT frame's keypoint slots
            Xw_cur = np.zeros((self.n_kp, 3), np.float32)
            Xw_vld = np.zeros(self.n_kp, bool)
            idx = np.asarray(m.idx)
            Xw_cur[idx[inl]] = X[inl]
            Xw_vld[idx[inl]] = True
            self.state = MonoState(uv, desc, valid, Xw_cur, Xw_vld, Tcw)
            self.poses.append(Tcw.astype(np.float32))
            return self.poses[-1]

        # --- tracked mode: motion-model projected matching, then PnP ---
        # Frame-to-frame slot survival is too low to feed PnP alone (~25%
        # of global matches land on slots that carry 3D — measured 14
        # valid -> 10 inliers -> LOST on the avenue scene).  Instead,
        # project the EXISTING map points into this frame under the
        # constant-velocity prediction and match by descriptor within a
        # radius — the reference's TrackWithMotionModel /
        # SearchByProjection (src/Tracking.cc, src/ORBmatcher.cc:1342),
        # which decouples 3D-2D correspondence count from detection
        # churn.  Global descriptor PnP stays as the fallback rung.
        Xw_prev = st.Xw[np.arange(len(uv_prev))]
        Tcw_pred = (self._velocity @ st.Tcw).astype(np.float32)
        Xc = (Tcw_pred[:3, :3] @ Xw_prev.T).T + Tcw_pred[:3, 3]
        z_pred = Xc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            uv_pred = np.stack(
                [fx * Xc[:, 0] / z_pred + cx, fy * Xc[:, 1] / z_pred + cy], -1
            ).astype(np.float32)
        proj_valid = (
            st.Xw_valid & (z_pred > 1e-6) & np.isfinite(uv_pred).all(1)
        )
        mp = matching.match_projected(
            jnp.asarray(st.desc), jnp.asarray(uv_pred),
            jnp.asarray(proj_valid), jnp.asarray(desc),
            jnp.asarray(uv.astype(np.float32)), jnp.asarray(valid),
            radius=18.0,
        )
        mp_valid = np.asarray(mp.valid) & st.Xw_valid
        uv_mp = uv[np.asarray(mp.idx)].astype(np.float32)
        sol = pnp.ransac_pnp(
            key, jnp.asarray(Xw_prev), jnp.asarray(uv_mp),
            jnp.asarray(mp_valid), fx, fy, cx, cy,
        )
        Tcw = np.asarray(sol.T)
        lost = int(sol.n_inliers) < 12
        if lost:
            # fallback rung: global descriptor matches (no prediction)
            pnp_valid = mvalid & st.Xw_valid
            sol2 = pnp.ransac_pnp(
                jax.random.fold_in(key, 1), jnp.asarray(Xw_prev),
                jnp.asarray(uv_cur.astype(np.float32)),
                jnp.asarray(pnp_valid), fx, fy, cx, cy,
            )
            if int(sol2.n_inliers) > int(sol.n_inliers):
                sol = sol2
                Tcw = np.asarray(sol.T)
                lost = int(sol.n_inliers) < 12
        if lost:
            # fallback: constant pose (LOST semantics)
            Tcw = st.Tcw
        # --- backend ladder (the reference's mono backend,
        # src/System.cc:34-116): relocalize on LOST, refine vs the map ---
        if self.keyframes is not None and self.keyframes.frames:
            if lost:
                T_reloc = self.keyframes.relocalize(
                    key, jnp.asarray(desc),
                    jnp.asarray(uv.astype(np.float32)),
                    jnp.asarray(valid), fx, fy, cx, cy,
                )
                if T_reloc is not None and np.isfinite(T_reloc).all():
                    Tcw = np.asarray(T_reloc, np.float32)
                    self.n_relocalizations += 1
                    lost = False
            if not lost:
                T_lm = self._track_local_map(Tcw, uv, desc, valid)
                if T_lm is not None:
                    Tcw = T_lm
        if lost:
            # keep the LAST-GOOD state untouched: the next frame matches
            # against the last tracked frame and its intact map.  The old
            # path rebuilt the state from this frame's matches with Tcw
            # frozen at st.Tcw — triangulating at zero baseline writes
            # garbage points that pass cheirality and the map decays, so
            # one glitched frame became permanent LOST.  (The reference
            # likewise creates no map points without tracked motion,
            # src/LocalMapping.cc CreateNewMapPoints.)
            self.n_lost_frames += 1
            self.poses.append(st.Tcw.astype(np.float32))
            return self.poses[-1]
        # re-triangulate matched pairs for the next frame's structure
        Kmat = np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        P1 = Kmat @ np.asarray(st.Tcw)[:3]
        P2 = Kmat @ Tcw[:3]
        X_new = np.asarray(
            triangulate(jnp.asarray(P1), jnp.asarray(P2),
                        jnp.asarray(uv_prev), jnp.asarray(uv_cur.astype(np.float32)))
        )
        # cheirality + match gating
        z1 = (np.asarray(st.Tcw)[:3, :3] @ X_new.T).T[:, 2] + np.asarray(st.Tcw)[2, 3]
        z2 = (Tcw[:3, :3] @ X_new.T).T[:, 2] + Tcw[2, 3]
        baseline = float(np.linalg.norm(
            np.linalg.inv(Tcw)[:3, 3] - np.linalg.inv(np.asarray(st.Tcw))[:3, 3]
        ))
        good = (
            mvalid & (z1 > 0) & (z2 > 0) & np.isfinite(X_new).all(1)
            & (baseline > 1e-6)
        )
        Xw_cur = np.zeros((self.n_kp, 3), np.float32)
        Xw_vld = np.zeros(self.n_kp, bool)
        idx = np.asarray(m.idx)
        Xw_cur[idx[good]] = X_new[good]
        Xw_vld[idx[good]] = True
        # persist existing map points across frames (the reference's MapPoints
        # live until culled, src/MapPoint.cc) — re-triangulating tracked points
        # every frame lets monocular scale drift; keeping them anchors it.
        # Both correspondence channels carry points forward: the global
        # descriptor matches AND the projection-guided matches (whose
        # current-frame slots differ).
        persist = mvalid & st.Xw_valid
        Xw_cur[idx[persist]] = Xw_prev[persist]
        Xw_vld[idx[persist]] = True
        idx_mp = np.asarray(mp.idx)
        Xw_cur[idx_mp[mp_valid]] = Xw_prev[mp_valid]
        Xw_vld[idx_mp[mp_valid]] = True
        self._velocity = (Tcw @ np.linalg.inv(st.Tcw)).astype(np.float32)
        self.state = MonoState(uv, desc, valid, Xw_cur, Xw_vld, Tcw.astype(np.float32))
        self.poses.append(Tcw.astype(np.float32))
        if self.keyframes is not None and not lost:
            self._maybe_keyframe_and_close_loop(
                uv, desc, valid, Xw_cur, Xw_vld, Tcw.astype(np.float32), key
            )
        return self.poses[-1]

    # ------------------------------------------------------------------
    def _track_local_map(self, Tcw, uv, desc, valid,
                         min_inliers: int = 20, max_corr: float = 0.35,
                         max_rot_deg: float = 2.0):
        """Local-map pose refinement (TrackLocalMap for mono): pure
        reprojection GN against the newest keyframes' triangulated points
        — z_cur = 0 disables the stereo disparity rows, so the map's own
        scale anchors the pose (the mechanism that slows scale drift
        BETWEEN loop closures)."""
        cam = self.cfg.camera
        T, n_inl, _ = self.keyframes.track_local_map(
            np.asarray(Tcw, np.float32),
            jnp.asarray(uv.astype(np.float32)), jnp.asarray(desc),
            jnp.asarray(valid), jnp.zeros(uv.shape[0], jnp.float32),
            cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            max(cam.bf, 1.0),
        )
        if n_inl < min_inliers or not np.isfinite(T).all():
            return None
        d = T @ np.linalg.inv(Tcw)
        if np.linalg.norm(d[:3, 3]) > max_corr:
            return None
        ang = np.degrees(
            np.arccos(np.clip((np.trace(d[:3, :3]) - 1.0) / 2.0, -1.0, 1.0))
        )
        if ang > max_rot_deg:
            return None
        return T.astype(np.float32)

    def _maybe_keyframe_and_close_loop(self, uv, desc, valid, Xw, Xw_vld,
                                       Tcw, key):
        from multimot_track_tpu.pipeline.keyframes import Keyframe

        cam = self.cfg.camera
        row = len(self.poses) - 1
        kf = Keyframe(
            index=row, Tcw=Tcw.copy(), uv=uv.astype(np.float32).copy(),
            desc=np.asarray(desc).copy(), valid=np.asarray(valid).copy(),
            Xw=np.asarray(Xw, np.float32).copy(),
        )
        # only triangulated points are 3-D consumers (local map/reloc/Sim3)
        kf.live = np.asarray(valid & Xw_vld)
        kf.bad = ~kf.live       # untriangulated = geometry untrustworthy
        if not self.keyframes.maybe_add(kf):
            return
        if len(self.keyframes.frames) < 4:
            return
        cand = self.keyframes.detect_loop(
            jnp.asarray(desc), jnp.asarray(valid),
            min_matches=self.loop_min_matches,
        )
        if cand is None:
            return
        if (len(self.keyframes.frames) - 1 - cand
                < self.loop_min_kf_separation):
            return
        traj = np.stack(self.poses).astype(np.float32)
        info = {}
        corrected, n = self.keyframes.close_loop(
            key, kf, cand, traj, [k.index for k in self.keyframes.frames],
            cam.fx, cam.fy, cam.cx, cam.cy, fix_scale=False, info=info,
        )
        if n == 0:
            return
        corrected = np.asarray(corrected)
        row_scale = info.get("row_scale", np.ones(len(corrected)))
        # re-anchor keyframe structure: camera-frame geometry is rescaled
        # by the row's cumulative drift correction, then moved with the
        # corrected pose (the mono version of CorrectLoop's map update)
        for k in self.keyframes.frames:
            c = float(row_scale[k.index])
            Xc = (k.Tcw[:3, :3] @ k.Xw.T).T + k.Tcw[:3, 3]
            Twc_new = np.linalg.inv(corrected[k.index])
            k.Xw = ((Twc_new[:3, :3] @ (c * Xc).T).T + Twc_new[:3, 3]).astype(
                np.float32
            )
            k.Tcw = corrected[k.index].astype(np.float32)
        self.keyframes._version += 1
        # live tracker state follows the newest row's correction
        st = self.state
        c = float(row_scale[-1])
        Xc = (st.Tcw[:3, :3] @ st.Xw.T).T + st.Tcw[:3, 3]
        Twc_new = np.linalg.inv(corrected[-1])
        st.Xw = ((Twc_new[:3, :3] @ (c * Xc).T).T + Twc_new[:3, 3]).astype(
            np.float32
        )
        st.Tcw = corrected[-1].astype(np.float32)
        self.poses = [corrected[i].astype(np.float32) for i in range(len(corrected))]
        self.loop_events.append((row, self.keyframes.frames[cand].index, n,
                                 info.get("scale", 1.0)))
