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
    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG, n_kp: int = 1024,
                 seed: int = 0):
        self.cfg = cfg
        self.n_kp = n_kp
        self.key = jax.random.PRNGKey(seed)
        self.state: Optional[MonoState] = None
        self.poses: List[np.ndarray] = []     # Tcw per frame
        self.initialized = False
        self._frame = 0

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

        # --- tracked mode: PnP vs previous structure, then re-triangulate ---
        Xw_prev = st.Xw[np.arange(len(uv_prev))]
        pnp_valid = mvalid & st.Xw_valid
        sol = pnp.ransac_pnp(
            key, jnp.asarray(Xw_prev), jnp.asarray(uv_cur.astype(np.float32)),
            jnp.asarray(pnp_valid), fx, fy, cx, cy,
        )
        Tcw = np.asarray(sol.T)
        if int(sol.n_inliers) < 12:
            # fallback: constant pose (LOST semantics)
            Tcw = st.Tcw
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
        good = mvalid & (z1 > 0) & (z2 > 0) & np.isfinite(X_new).all(1)
        Xw_cur = np.zeros((self.n_kp, 3), np.float32)
        Xw_vld = np.zeros(self.n_kp, bool)
        idx = np.asarray(m.idx)
        Xw_cur[idx[good]] = X_new[good]
        Xw_vld[idx[good]] = True
        # persist existing map points across frames (the reference's MapPoints
        # live until culled, src/MapPoint.cc) — re-triangulating tracked points
        # every frame lets monocular scale drift; keeping them anchors it.
        persist = pnp_valid
        Xw_cur[idx[persist]] = Xw_prev[persist]
        Xw_vld[idx[persist]] = True
        self.state = MonoState(uv, desc, valid, Xw_cur, Xw_vld, Tcw.astype(np.float32))
        self.poses.append(Tcw.astype(np.float32))
        return self.poses[-1]
