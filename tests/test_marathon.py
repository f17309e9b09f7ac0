"""Marathon integration: a long shuttle sequence through the full live
system with a deliberately tiny keyframe capacity.

Exercises interactions no single-feature test covers: keyframe-store
EVICTION and live redundancy CULLING while trajectory rows (derived from
``kf.index``) must stay consistent, repeated loop closures rewriting the
trajectory (and re-anchoring keyframe map points), local-map tracking
running across those corrections, and the dense-flow fallback over every
pair (the fixture ships no .flo files)."""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.io.synth import build
from multimot_track_tpu.pipeline.system import MultiMotSystem

TEST_CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=2048, k_obj_max=4
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60, obj_lm_iters=60,
        obj_ensemble_seeds=1,
    ),
    backend=dataclasses.replace(DEFAULT_CONFIG.backend, window_refine=False),
)


@pytest.fixture(scope="module")
def shuttle_dir(tmp_path_factory, kitti_sample_dir):
    dst = tmp_path_factory.mktemp("seq") / "shuttle"
    # fwd, rev, fwd, rev: 17 frames, two genuine revisits of the head
    order = (
        list(range(5)) + list(range(3, -1, -1))
        + list(range(1, 5)) + list(range(3, -1, -1))
    )
    build(kitti_sample_dir, dst, order=order)
    return dst


@pytest.mark.slow
def test_marathon_shuttle(shuttle_dir):
    seq = KittiSequence(shuttle_dir)
    assert len(seq) == 17
    s = MultiMotSystem(TEST_CFG, keyframe_gap=2)
    s.keyframes.capacity = 5          # force evictions (17 frames / gap 2)
    for i in range(len(seq)):
        s.track_rgbd(seq.load_frame(i))

    # the run completed with a full, finite trajectory
    assert len(s.map.camera_poses) == 17
    assert all(np.isfinite(T).all() for T in s.map.camera_poses)

    # eviction actually happened and the index invariant holds: every
    # keyframe's trajectory row IS its frame index
    assert len(s.keyframes.frames) <= 5
    rows = [kf.index for kf in s.keyframes.frames]
    assert all(0 <= r < len(s.map.camera_poses) for r in rows), rows
    assert rows == sorted(rows)

    # the shuttle revisits the head twice: loop closing fired at least once
    assert len(s.map.loop_events) >= 1, s.map.loop_events

    # keyframe map points stayed anchored to their (corrected) poses:
    # every keyframe's points, brought to its own camera, sit in front of
    # it at plausible depths
    for kf in s.keyframes.frames:
        Xc = (kf.Tcw[:3, :3] @ kf.Xw[kf.valid].T).T + kf.Tcw[:3, 3]
        assert np.isfinite(Xc).all()
        assert (Xc[:, 2] > 0).mean() > 0.95

    # bounded drift on a ~40 m shuttle (GT available for every frame)
    ate = s.ate()
    assert ate is not None and ate < 0.5, ate
