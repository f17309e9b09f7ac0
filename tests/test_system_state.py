"""State machine, checkpoint/resume, and reset behaviour of the facade."""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import FrameData, KittiSequence
from multimot_track_tpu.pipeline.system import MultiMotSystem

SMALL_CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=256, n_obj_pts_max=512, k_obj_max=2
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=50, cam_lm_iters=20, obj_lm_iters=20
    ),
)


def black_frame(i, H=64, W=96):
    """A featureless frame: no corners, no flow -> tracker must go LOST."""
    return FrameData(
        index=i,
        timestamp=0.1 * i,
        gray=np.zeros((H, W), np.float32),
        depth_raw=np.full((H, W), 256.0 * 30.0, np.float32),
        flow=np.zeros((H, W, 2), np.float32),
        sem_mask=np.zeros((H, W), np.int32),
        pose_gt=np.eye(4, dtype=np.float32),
        obj_ids_gt=np.zeros(0, np.int32),
        obj_poses_gt=np.zeros((0, 4, 4), np.float32),
        obj_bboxes_gt=np.zeros((0, 4), np.float32),
    )


def test_lost_state_and_velocity_fallback():
    sys_ = MultiMotSystem(SMALL_CFG)
    for i in range(3):
        sys_.track_rgbd(black_frame(i))
    assert sys_.state == MultiMotSystem.STATE_LOST
    # pose must not explode under the fallback
    T = sys_.map.camera_poses[-1]
    assert np.all(np.isfinite(T))
    assert np.linalg.norm(T[:3, 3]) < 10.0


def test_checkpoint_roundtrip(tmp_path, kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    a = MultiMotSystem(SMALL_CFG)
    a.track_rgbd(seq.load_frame(0))
    a.track_rgbd(seq.load_frame(1))
    a.save_checkpoint(tmp_path / "ckpt.pkl")

    b = MultiMotSystem(SMALL_CFG)
    b.load_checkpoint(tmp_path / "ckpt.pkl")
    ra = a.track_rgbd(seq.load_frame(2))
    rb = b.track_rgbd(seq.load_frame(2))
    np.testing.assert_allclose(
        np.asarray(ra.Tcw_cur), np.asarray(rb.Tcw_cur), atol=1e-6
    )
    assert len(b.map.camera_poses) == len(a.map.camera_poses)
