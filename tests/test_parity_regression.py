"""Regression gate pinned to the measured head-to-head numbers (PARITY.md).

Run with the full default configuration over the whole kitti_sample; the
bounds sit between our measured results and a regression that would lose
parity with the reference (reference means: camera 4.94 % t, object
9.90 % t, speed error 5.25 %)."""

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline.system import run_sequence


@pytest.mark.slow
def test_full_config_parity(kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    sys_ = run_sequence(seq, DEFAULT_CONFIG, n_frames=5)
    s = sys_.summary()
    # measured round 2: cam 0.0488 online (reference: 0.0496) / obj
    # 0.061-0.072 across seeds / speed 0.0355 (photometric gate +
    # symmetric camera solve + depth-variance weighting + object seed
    # ensemble w/ composite consensus); gates sit between our measurement
    # and the reference so losing the head-to-head fails the suite
    assert s["cam_t_rpe_rel_mean"] < 0.0496, s
    assert s["obj_t_rpe_rel_mean"] < 0.080, s
    assert s["obj_speed_err_rel_mean"] < 0.055, s
    assert s["n_obj_estimates"] == 4
