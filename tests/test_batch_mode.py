"""Batched sequence tracking vs the online mode on kitti_sample."""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline.batch import run_sequence_batched
from multimot_track_tpu.pipeline.system import run_sequence

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=4096, k_obj_max=4
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60, obj_lm_iters=100
    ),
)


@pytest.mark.slow
def test_batched_matches_online(kitti_sample_dir):
    seq = KittiSequence(kitti_sample_dir)
    frames = [seq.load_frame(i) for i in range(4)]
    Tcw, res, records = run_sequence_batched(frames, CFG)
    online = run_sequence(seq, CFG, n_frames=4)

    assert Tcw.shape == (4, 4, 4)
    # camera RPE magnitudes should land in the same regime as online mode
    rel_b = np.asarray(res.cam_t_rpe_rel)
    rel_o = np.asarray(online.map.cam_rpe_rel)[:, 0]
    assert rel_b.shape[0] == 3
    assert np.abs(np.mean(rel_b) - np.mean(rel_o)) < 0.05, (rel_b, rel_o)

    # trajectory endpoints agree to within accumulated small differences
    T_online = np.linalg.inv(online.map.camera_poses[-1])
    E = Tcw[-1] @ np.linalg.inv(T_online)
    assert np.linalg.norm(E[:3, 3]) < 0.25, E[:3, 3]

    # objects found with persistent ids and sane speeds
    assert records
    gt_rec = [r for r in records if r["has_gt"]]
    assert gt_rec
    for r in gt_rec:
        assert 0 < r["speed_gt"] < 200
        assert abs(r["speed_est"] - r["speed_gt"]) < 25
    ids = {r["track_id"] for r in records}
    assert len(ids) >= 1
