"""System-level backend integration: loop closing runs INSIDE the live
tracking loop (VERDICT round-1 item 1 — previously the LoopClosing chain
existed only as library code).

Fixture: kitti_sample played forward then reversed (io/synth.build) — the
tail revisits the head.  No .flo files exist in the fixture, so this also
exercises the loader's on-device dense-flow fallback end to end."""

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
        DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60, obj_lm_iters=60
    ),
    # window refinement and local-map tracking off: this file isolates the
    # LOOP-CLOSING effect (both drift-reducers shrink the ATE delta the
    # assertions measure — with local-map tracking on, the fixture's drift
    # is already so small the loop correction has nothing left to win)
    backend=dataclasses.replace(
        DEFAULT_CONFIG.backend, window_refine=False, track_local_map=False,
        joint_window_refine=False,
    ),
)


@pytest.fixture(scope="module")
def revisit_dir(tmp_path_factory, kitti_sample_dir):
    dst = tmp_path_factory.mktemp("seq") / "revisit"
    build(kitti_sample_dir, dst)
    return dst


def _run(revisit_dir, enable_lc):
    seq = KittiSequence(revisit_dir)
    # loop_consistency=1: this 9-frame fixture has exactly ONE qualifying
    # detection (the others fail the temporal-separation guard), so it
    # exercises the ladder mechanics; the consecutive-detection policy
    # has its own unit test (test_system_state) and fires on the longer
    # shuttle/circuit fixtures
    s = MultiMotSystem(TEST_CFG, enable_loop_closing=enable_lc, keyframe_gap=2,
                       loop_consistency=1)
    for i in range(len(seq)):
        s.track_rgbd(seq.load_frame(i))
    return s


@pytest.mark.slow
def test_loop_closing_in_live_system(revisit_dir):
    s_off = _run(revisit_dir, enable_lc=False)
    s_on = _run(revisit_dir, enable_lc=True)
    # a loop was detected, Sim3-verified and applied
    assert len(s_on.map.loop_events) >= 1, s_on.map.loop_events
    frame, matched_kf, n_inl = s_on.map.loop_events[0]
    assert n_inl >= 20
    # the matched keyframe must be temporally distant (a real revisit)
    assert frame - matched_kf >= 4
    # the correction reduces trajectory ATE vs the no-backend run
    assert s_off.ate() is not None and s_on.ate() is not None
    assert s_on.ate() < s_off.ate(), (s_on.ate(), s_off.ate())
    # the whole run consumed estimated flow (fixture has no .flo files)
    assert s_on.summary()["n_loop_closures"] >= 1


@pytest.mark.slow
def test_forward_sequence_no_false_loops(kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    s = MultiMotSystem(TEST_CFG, keyframe_gap=1)
    for i in range(len(seq)):
        s.track_rgbd(seq.load_frame(i))
    # forward drive: no revisit -> no loop closures fired
    assert s.map.loop_events == []
