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


def test_keyframes_and_relocalization(kitti_sample_dir):
    """Keyframe store fills during tracking; relocalization recovers the
    pose when a pair's correspondences are destroyed."""
    seq = KittiSequence(kitti_sample_dir)
    sys_ = MultiMotSystem(SMALL_CFG, enable_keyframes=True, keyframe_gap=1)
    for i in range(2):
        sys_.track_rgbd(seq.load_frame(i))
    assert sys_.keyframes is not None
    assert len(sys_.keyframes.frames) >= 1

    # frame 2 arrives with garbage flow: the NEXT pair (2 -> 3) inherits
    # these correspondences and must go LOST; frame 3's image is real, so
    # relocalization against the stored keyframes recovers the pose
    rng = np.random.default_rng(0)
    f2 = seq.load_frame(2)
    f2_broken = FrameData(
        index=2, timestamp=f2.timestamp, gray=f2.gray,
        depth_raw=f2.depth_raw,
        flow=rng.uniform(-80, 80, f2.flow.shape).astype(np.float32),
        sem_mask=f2.sem_mask, pose_gt=f2.pose_gt,
        obj_ids_gt=f2.obj_ids_gt, obj_poses_gt=f2.obj_poses_gt,
        obj_bboxes_gt=f2.obj_bboxes_gt,
    )
    sys_.track_rgbd(f2_broken)
    f3 = seq.load_frame(3)
    r = sys_.track_rgbd(f3)
    assert sys_.state == MultiMotSystem.STATE_OK, sys_.state
    T = np.asarray(r.Tcw_cur)
    assert np.all(np.isfinite(T))
    # recovered pose close to frame 3 ground truth (est world == gt world
    # up to a few cm of drift over 3 frames)
    Tcw_gt3 = np.linalg.inv(f3.pose_gt)
    E = T @ np.linalg.inv(Tcw_gt3)
    assert np.linalg.norm(E[:3, 3]) < 0.8, E[:3, 3]


def test_live_culling_collapses_duplicate_keyframes(kitti_sample_dir):
    """LocalMapping::KeyFrameCulling runs in the live loop: identical
    frames produce >90%-covisible keyframes, and the middles get culled."""
    seq = KittiSequence(kitti_sample_dir)
    sys_ = MultiMotSystem(SMALL_CFG, keyframe_gap=1, enable_loop_closing=False)
    for _ in range(5):
        sys_.track_rgbd(seq.load_frame(0))
    assert sys_.state == MultiMotSystem.STATE_OK
    # without culling there would be 5 keyframes
    assert 1 <= len(sys_.keyframes.frames) <= 3, len(sys_.keyframes.frames)


def test_loop_candidate_consistency_gate():
    """Consecutive-detection consistency (the reference's consistency
    groups, src/LoopClosing.cc:105-230): scattered single-shot candidates
    (repetitive-texture false positives) must NOT open the loop ladder;
    three consecutive detections of one region must."""
    from multimot_track_tpu.pipeline.system import MultiMotSystem

    s = MultiMotSystem(enable_keyframes=True, keyframe_gap=5)
    # scattered candidates: never consistent
    assert not s._note_loop_candidate(10)
    assert not s._note_loop_candidate(None)
    assert not s._note_loop_candidate(50)
    assert not s._note_loop_candidate(90)   # spread way beyond 2 gaps
    # a genuine revisit: same region for three consecutive keyframes
    assert not s._note_loop_candidate(12)
    assert not s._note_loop_candidate(14)
    assert s._note_loop_candidate(17)       # within 2*gap of the others
    # the gate keeps firing while the revisit window lasts (a downstream
    # Sim3/drift rejection must not discard the evidence); the LADDER
    # clears the history only after an ACCEPTED closure
    assert s._note_loop_candidate(18)
    s._loop_history.clear()                 # what _maybe_close_loop does
    assert not s._note_loop_candidate(19)   # fresh evidence required
    # single-shot mode accepts immediately
    s1 = MultiMotSystem(enable_keyframes=True, loop_consistency=1)
    assert s1._note_loop_candidate(3)
    assert not s1._note_loop_candidate(None)
