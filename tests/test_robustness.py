"""Degenerate-input robustness: the jitted pipeline must stay finite and
the state machine must absorb pathological frames (SURVEY.md §5 failure
handling; the reference crashes on several of these)."""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import FrameData, KittiSequence
from multimot_track_tpu.pipeline.system import MultiMotSystem

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=256, n_obj_pts_max=512, k_obj_max=2
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=50, obj_ransac_iters=50,
        cam_lm_iters=15, obj_lm_iters=15,
    ),
)


def frame(i, gray=None, depth=None, flow=None, sem=None, H=64, W=96):
    return FrameData(
        index=i,
        timestamp=0.1 * i,
        gray=np.zeros((H, W), np.float32) if gray is None else gray,
        depth_raw=np.full((H, W), 256.0 * 10.0, np.float32) if depth is None else depth,
        flow=np.zeros((H, W, 2), np.float32) if flow is None else flow,
        sem_mask=np.zeros((H, W), np.int32) if sem is None else sem,
        pose_gt=np.eye(4, dtype=np.float32),
        obj_ids_gt=np.zeros(0, np.int32),
        obj_poses_gt=np.zeros((0, 4, 4), np.float32),
        obj_bboxes_gt=np.zeros((0, 4), np.float32),
    )


def run_frames(frames):
    sys_ = MultiMotSystem(CFG)
    results = [sys_.track_rgbd(f) for f in frames]
    for r in results[1:]:
        assert r is not None
        assert np.all(np.isfinite(np.asarray(r.Tcw_cur))), "pose poisoned"
    return sys_, results


def test_zero_depth_everywhere():
    rng = np.random.default_rng(0)
    g = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    run_frames([frame(i, gray=g, depth=np.zeros((64, 96), np.float32)) for i in range(3)])


def test_fully_masked_frame():
    rng = np.random.default_rng(1)
    g = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    sem = np.ones((64, 96), np.int32)
    run_frames([frame(i, gray=g, sem=sem) for i in range(3)])


def test_nan_flow_does_not_poison():
    rng = np.random.default_rng(2)
    g = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    fl = np.full((64, 96, 2), np.nan, np.float32)
    sys_, _ = run_frames([frame(i, gray=g, flow=fl) for i in range(3)])
    for T in sys_.map.camera_poses:
        assert np.all(np.isfinite(T))


def test_saturated_depth():
    rng = np.random.default_rng(3)
    g = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    d = np.full((64, 96), 65535.0, np.float32)  # min depth ~ bf/256
    run_frames([frame(i, gray=g, depth=d) for i in range(3)])


def test_single_pixel_objects():
    rng = np.random.default_rng(4)
    g = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    sem = np.zeros((64, 96), np.int32)
    sem[10, 10] = 1
    sem[30, 50] = 2
    fl = np.full((64, 96, 2), 1.0, np.float32)
    sys_, results = run_frames([frame(i, gray=g, sem=sem, flow=fl) for i in range(3)])
    # objects below the 100-point gate must never become active
    for r in results[1:]:
        assert not np.asarray(r.objects.active).any()


@pytest.mark.slow
def test_flow_outlier_injection_absorbed(kitti_sample_dir):
    """The reference's outlier-flow injector (Frame.cc:276-301, commented):
    with 10% of flow pixels corrupted by N(0, 15 px) offsets, the
    photometric gate + RANSAC must keep the camera solve sane."""
    cfg = dataclasses.replace(
        CFG,
        solver=dataclasses.replace(
            CFG.solver, flow_outliers=True, flow_outlier_frac=0.1,
            flow_outlier_mag=15.0,
        ),
    )
    seq = KittiSequence(kitti_sample_dir)
    sys_ = MultiMotSystem(cfg, enable_keyframes=False)
    errs = []
    for i in range(3):
        r = sys_.track_rgbd(seq.load_frame(i))
        if r is not None:
            assert np.all(np.isfinite(np.asarray(r.Tcw_cur)))
            errs.append(float(r.cam_t_rpe_rel))
    # corrupted flow, yet the pair errors stay in the tracking regime
    assert len(errs) == 2
    assert np.mean(errs) < 0.20, errs
