"""End-to-end integration on the bundled kitti_sample — the de-facto golden
fixture (SURVEY.md §4).  Accuracy oracles: the reference's printed per-frame
camera/object RPE semantics."""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline.system import run_sequence

# slimmer padding/iters keep CPU test time sane; accuracy targets unchanged
TEST_CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=4096, k_obj_max=4
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60, obj_lm_iters=100
    ),
)


@pytest.fixture(scope="module")
def tracked(kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    return run_sequence(seq, TEST_CFG, n_frames=3)


def test_camera_accuracy(tracked):
    rel = np.asarray(tracked.map.cam_rpe_rel)
    assert rel.shape[0] == 2
    # Accuracy on kitti_sample is data-limited: with GT flow the solver
    # recovers the pose to < 0.01 cm (see tests/test_flow_ba.py), while the
    # bundled .flo flow has median ~1.8 px error -> ~5 % forward-scale noise
    # that the reference pipeline is subject to identically.
    assert rel[:, 0].mean() < 0.10, rel
    assert rel[:, 1].mean() < 0.5, rel


def test_objects_tracked(tracked):
    recs = tracked.map.obj_records
    assert len(recs) >= 2  # the sample has at least one moving car per pair
    with_gt = [r for r in recs if r.has_gt]
    assert with_gt, "expected GT-matched object estimates"
    for r in with_gt:
        assert r.speed_gt > 0.0
        assert r.n_points > TEST_CFG.segmentation.min_obj_points


def test_object_motion_accuracy(tracked):
    with_gt = [r for r in tracked.map.obj_records if r.has_gt]
    t_rel = np.asarray([r.t_rpe_rel for r in with_gt])
    assert np.median(t_rel) < 0.5, t_rel  # coarse round-1 gate; tightened later


def test_track_id_persistence(tracked):
    recs = tracked.map.obj_records
    by_frame = {}
    for r in recs:
        by_frame.setdefault(r.frame, []).append(r)
    frames = sorted(by_frame)
    if len(frames) >= 2:
        ids_a = {r.track_id for r in by_frame[frames[0]]}
        ids_b = {r.track_id for r in by_frame[frames[1]]}
        assert ids_a & ids_b, "same physical object should keep its track id"


def test_trajectory_io(tracked, tmp_path):
    tracked.save_trajectory_kitti(tmp_path / "kitti.txt")
    tracked.save_trajectory_tum(tmp_path / "tum.txt")
    lines = (tmp_path / "kitti.txt").read_text().splitlines()
    assert len(lines) == 3
    assert len(lines[0].split()) == 12
    tum = (tmp_path / "tum.txt").read_text().splitlines()
    assert len(tum[0].split()) == 8
