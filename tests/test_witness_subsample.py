"""Witness subsampling (SolverConfig.obj_ransac_score_pts /
obj_consensus_pts) must be a throughput knob, not an accuracy knob.

The subsampled stages estimate proportions (RANSAC inlier-count rank,
consensus registered fraction); the winner's inlier set and all LM
solves use every member (pipeline/tracker.py solve_chain/consensus).
This pins: (a) the ego path is bit-identical with and without
subsampling (the knobs touch only the object branch), (b) the object
estimate stays within the inter-seed spread of the full-member result.
"""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline.system import run_sequence

_BASE = dataclasses.replace(
    DEFAULT_CONFIG,
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=4096, k_obj_max=4
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60, obj_lm_iters=100
    ),
)

SUB = _BASE  # defaults: 512-point strided subsample
FULL = dataclasses.replace(
    _BASE,
    solver=dataclasses.replace(
        _BASE.solver, obj_ransac_score_pts=0, obj_consensus_pts=0
    ),
)


@pytest.fixture(scope="module")
def runs(kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    return (
        run_sequence(seq, SUB, n_frames=2),
        run_sequence(seq, FULL, n_frames=2),
    )


def test_ego_path_untouched(runs):
    sub, full = runs
    np.testing.assert_allclose(
        np.asarray(sub.map.camera_poses), np.asarray(full.map.camera_poses),
        atol=1e-5,
    )


def test_object_estimate_within_seed_spread(runs):
    sub, full = runs
    recs_s = [r for r in sub.map.obj_records if r.has_gt]
    recs_f = [r for r in full.map.obj_records if r.has_gt]
    assert recs_s and recs_f
    t_s = float(np.median([r.t_rpe_rel for r in recs_s]))
    t_f = float(np.median([r.t_rpe_rel for r in recs_f]))
    # inter-seed spread of the object solve on this sample is ~3-11 %
    # (PARITY.md change 3b); the subsample must stay inside it
    assert abs(t_s - t_f) < 0.06, (t_s, t_f)
