"""Monocular ego-only tracking on the kitti_sample grayscale stream."""

import numpy as np
import pytest

from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline.mono import MonoTracker


@pytest.mark.slow
def test_mono_tracks_forward_motion(kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    tracker = MonoTracker(n_kp=768)
    for i in range(4):
        T = tracker.track(seq.load_frame(i).gray)
    assert tracker.initialized
    assert len(tracker.poses) == 4
    # up-to-scale: the dominant translation direction must be forward (+z
    # in camera coords => Tcw translation mostly -z after inversion);
    # compare normalized directions against GT
    Tcw = tracker.poses[-1]
    Twc = np.linalg.inv(Tcw)
    d_est = Twc[:3, 3] / max(np.linalg.norm(Twc[:3, 3]), 1e-9)
    gt_last = seq.load_frame(3).pose_gt  # camera-to-world on disk
    d_gt = gt_last[:3, 3] / max(np.linalg.norm(gt_last[:3, 3]), 1e-9)
    assert float(np.dot(d_est, d_gt)) > 0.95, (d_est, d_gt)
