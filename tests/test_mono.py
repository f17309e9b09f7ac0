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


def _scale_series(tracker, frames, skip=4):
    """Per-frame ratio est-translation / gt-translation (the monocular
    scale); constant = no drift."""
    ratios = []
    for i in range(skip, len(tracker.poses)):
        Twc_a = np.linalg.inv(tracker.poses[i - 1])
        Twc_b = np.linalg.inv(tracker.poses[i])
        est = np.linalg.norm(Twc_b[:3, 3] - Twc_a[:3, 3])
        gt = np.linalg.norm(
            frames[i].pose_gt[:3, 3] - frames[i - 1].pose_gt[:3, 3]
        )
        if gt > 1e-6 and est > 1e-9:
            ratios.append(est / gt)
    return np.asarray(ratios)


def _run_mono(frames, enable_backend):
    from multimot_track_tpu.config import DEFAULT_CONFIG

    tr = MonoTracker(DEFAULT_CONFIG, n_kp=768,
                     enable_backend=enable_backend, keyframe_gap=3)
    for fd in frames:
        tr.track(fd.gray)
    return tr


@pytest.mark.slow
def test_mono_backend_scale_drift(shuttle_frames):
    """The mono backend (keyframes + local-map refinement + loop ladder)
    must bound scale drift on a long sequence.  Fixture: kitti_sample
    played forward-reverse repeatedly (real texture — ORB descriptor
    matching needs it; the procedural synth texture aliases between
    frames), exact GT poses.  Drift metric: ratio of the late-window to
    early-window monocular scale (est/gt translation); 1.0 = none."""
    frames = shuttle_frames

    tr_off = _run_mono(frames, enable_backend=False)
    tr_on = _run_mono(frames, enable_backend=True)
    assert tr_on.keyframes is not None and len(tr_on.keyframes.frames) >= 5

    r_off = _scale_series(tr_off, frames)
    r_on = _scale_series(tr_on, frames)
    assert r_on.size > 20 and r_off.size > 20

    def drift(r):
        head = np.median(r[: max(5, len(r) // 5)])
        tail = np.median(r[-max(5, len(r) // 5):])
        return abs(np.log(tail / head))

    d_off, d_on = drift(r_off), drift(r_on)
    # the backend must not be worse, and must keep drift small in absolute
    # terms; the VO-only path is allowed to drift freely.  (Per-frame
    # scale VARIANCE is legitimately higher with the backend on — map
    # refinements and loop corrections are step changes by design.)
    assert d_on <= d_off + 0.02, (d_on, d_off)
    assert d_on < 0.20, (d_on, d_off)


@pytest.fixture(scope="module")
def shuttle_frames(kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    base = [seq.load_frame(i) for i in range(len(seq))]
    lap = list(range(5)) + list(range(3, 0, -1))     # fwd + reverse
    order = (lap * 5)[:40]
    return [base[i] for i in order]
