"""Joint ego+object sliding-window BA in the live backend.

The reference runs LocalBundleAdjustment continuously from LocalMapping
(src/LocalMapping.cc:48 -> src/Optimizer.cc:3341); the BASELINE target
extends it with per-pair object motions.  Here the live system triggers
pipeline/window_refine.refine_joint_window at keyframe cadence; this test
drives kitti_sample through the system and checks the joint solve runs,
commits bounded corrections, and keeps (or improves) the object metrics.
"""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline.system import MultiMotSystem

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=4096, k_obj_max=4
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60, obj_lm_iters=100
    ),
    backend=dataclasses.replace(
        DEFAULT_CONFIG.backend, joint_static_max=512, joint_obj_pts=96,
    ),
)


@pytest.mark.slow
def test_joint_window_live(kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    sys_ = MultiMotSystem(CFG, keyframe_gap=1)  # keyframe (and joint BA) every frame
    for i in range(5):
        sys_.track_rgbd(seq.load_frame(i))

    # the joint solve ran once the window filled (frames 0..4 @ gap 1)
    assert sys_.n_joint_refines >= 1

    s = sys_.summary()
    # object estimates survived, refined metrics finite and in regime
    assert s["n_obj_estimates"] == 4
    assert s["obj_t_rpe_refined_mean"] is not None
    assert np.isfinite(s["obj_t_rpe_refined_mean"])
    # joint BA improves the refined object estimate.  Measured with this
    # config on the wire-v2 live path: 0.0707 without the joint solve ->
    # 0.0657 with it (the improvement was 0.0665 -> 0.0539 on unquantised
    # inputs — the half-res wire flow feeds the window's re-derived object
    # observations, so codec thrift trades a little backend power).  Gate
    # between the two measurements with seed margin.
    assert s["obj_t_rpe_refined_mean"] < 0.069, s["obj_t_rpe_refined_mean"]
    # trajectory still sane after committed window rewrites
    assert s["ego_ate_rmse_m"] < 0.15


@pytest.mark.slow
def test_joint_window_solver_recovers_perturbation(kitti_sample_dir):
    """Perturb the online object measurement; the joint window solve must
    pull it back toward the flow-consistent motion (refined t-RPE below
    the perturbed one)."""
    seq = KittiSequence(kitti_sample_dir)
    sys_ = MultiMotSystem(CFG, keyframe_gap=1)
    for i in range(5):
        sys_.track_rgbd(seq.load_frame(i))
    recs = [r for r in sys_.map.obj_records if r.has_gt and r.P_lc is not None]
    assert recs
    before, _ = sys_.refined_obj_metrics()

    # corrupt every record's measurement by a 3% forward push
    bump = np.eye(4, dtype=np.float32)
    bump[2, 3] = 0.05
    for r in recs:
        r.P_lc = (bump @ r.P_lc).astype(np.float32)
    corrupted, _ = sys_.refined_obj_metrics()
    assert corrupted > before

    refined_last = sys_._refine_joint_window()
    assert refined_last is not None
    after, _ = sys_.refined_obj_metrics()
    assert after < corrupted, (before, corrupted, after)
