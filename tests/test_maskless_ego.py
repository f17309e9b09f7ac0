"""Ego robustness without instance masks (the self-contained path).

The reference hard-requires per-pixel instance masks; without them a
large coherent mover enters the static set.  Measured failure mode
(kitti_sample pair 0->1, masks zeroed): RANSAC still finds the correct
199-point background consensus, but the Huber+flow-prior LM then walks
out of the static basin — 42 near van points (5.7% of the set) drag the
pose 0.5 m sideways in a breakdown cascade (inliers 325 -> 0 over the
iterations).  The reference avoids this by EXCLUDING chi2-outliers
between optimization rounds (Optimizer.cc:539-565); our fixed-shape
equivalent is the init-consensus pre-gate
(SolverConfig.cam_init_consensus_px).  This test pins the fix.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline import frames as F
from multimot_track_tpu.pipeline import tracker


def _pair_rpe(cfg, kitti_sample_dir, zero_sem):
    seq = KittiSequence(kitti_sample_dir, estimate_flow=False)
    K = cfg.padding.k_obj_max
    fds = [seq.load_frame(i) for i in (0, 1)]
    obs = []
    for fd in fds:
        sem = np.zeros_like(fd.sem_mask) if zero_sem else fd.sem_mask
        gt = F.make_gt_table(fd.pose_gt, fd.obj_ids_gt, fd.obj_poses_gt, K)
        obs.append(tracker.first_step(
            np.clip(np.round(fd.gray), 0, 255).astype(np.uint8),
            np.clip(fd.depth_raw, 0, 65535).astype(np.uint16),
            np.clip(fd.flow * 128.0, -32767, 32767).astype(np.int16),
            np.clip(sem, 0, 255).astype(np.uint8), gt, cfg))
    fd1 = fds[1]
    sem1 = np.zeros_like(fd1.sem_mask) if zero_sem else fd1.sem_mask
    pair = F.build_pair(
        obs[0],
        jnp.asarray(np.clip(fd1.depth_raw, 0, 65535).astype(np.uint16)).astype(jnp.float32),
        jnp.asarray(np.clip(sem1, 0, 255).astype(np.int32)),
        F.make_gt_table(fd1.pose_gt, fd1.obj_ids_gt, fd1.obj_poses_gt, K),
        cfg,
        cur_gray=jnp.asarray(fd1.gray, jnp.float32),
    )
    res = tracker.track_pair(jax.random.PRNGKey(0), pair,
                             tracker.initial_context(K), cfg)
    return float(res.cam_t_rpe_rel), int(res.n_static_inliers)


@pytest.mark.slow
def test_maskless_pair_tracks(kitti_sample_dir):
    t, n_inl = _pair_rpe(DEFAULT_CONFIG, kitti_sample_dir, zero_sem=True)
    assert t < 0.10, t          # was 0.66 before the consensus pre-gate
    assert n_inl > 300


@pytest.mark.slow
def test_consensus_gate_is_the_fix(kitti_sample_dir):
    """Without the pre-gate the maskless solve diverges — guards against
    silently losing the mechanism (e.g. a config default change)."""
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        solver=dataclasses.replace(DEFAULT_CONFIG.solver,
                                   cam_init_consensus_px=0.0),
    )
    t_off, _ = _pair_rpe(cfg, kitti_sample_dir, zero_sem=True)
    t_on, _ = _pair_rpe(DEFAULT_CONFIG, kitti_sample_dir, zero_sem=True)
    assert t_off > 0.3          # documented breakdown
    assert t_on < 0.10
