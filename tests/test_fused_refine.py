"""Fused live refinement (pipeline/live_refine): the one-fetch-per-frame
serving path must reproduce the dispatch-per-rung control flow exactly.

The unfused branch mirrors the reference's structure (TrackLocalMap at
src/Tracking.cc:3189, then the LocalMapping window BA) as separate
programs; the fused branch evaluates the same acceptance gates on device.
Both must produce the same trajectory and metrics."""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline import live_refine
from multimot_track_tpu.pipeline.system import MultiMotSystem

TEST_CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=2048, k_obj_max=4
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60, obj_lm_iters=60
    ),
    backend=dataclasses.replace(DEFAULT_CONFIG.backend, window_size=3),
)


def test_packed_offsets_cover_vector():
    offs, total = live_refine.packed_offsets(TEST_CFG)
    # offsets are dense and ordered: the last leaf ends at the total size
    ends = [o + int(np.prod(s)) if s else o + 1 for o, s in offs.values()]
    assert max(ends) == total
    # the two fields the device program slices exist and are scalar/4x4
    oT, sT = live_refine._lookup(offs, ".Tcw_cur")
    assert sT == (4, 4) and oT == 0
    _, s_n = live_refine._lookup(offs, ".n_static_inliers")
    assert s_n == ()


def _run(kitti_sample_dir, fused):
    cfg = dataclasses.replace(
        TEST_CFG,
        backend=dataclasses.replace(TEST_CFG.backend, fused_refine=fused),
    )
    seq = KittiSequence(kitti_sample_dir)
    s = MultiMotSystem(cfg, keyframe_gap=1)
    for i in range(len(seq)):
        s.track_rgbd(seq.load_frame(i))
    return s


@pytest.mark.slow
def test_fused_matches_unfused(kitti_sample_dir):
    a = _run(kitti_sample_dir, fused=True)
    b = _run(kitti_sample_dir, fused=False)
    pa = np.stack(a.map.camera_poses)
    pb = np.stack(b.map.camera_poses)
    assert np.abs(pa - pb).max() < 1e-3, np.abs(pa - pb).max()
    sa, sb = a.summary(), b.summary()
    for k in ("cam_t_rpe_rel_mean", "obj_t_rpe_rel_mean", "ego_ate_rmse_m"):
        assert abs(sa[k] - sb[k]) < 1e-3, (k, sa[k], sb[k])
    # both runs actually exercised the refinement rungs
    assert a.keyframes is not None and len(a.keyframes.frames) >= 2
