"""Serving-mode streaming runner + wire codec v2.

The streaming mode is the production serving shape of the batched
pipeline (PERF.md): chunked dispatch with a device-resident boundary
carry, async uploads, one draining fetch.  The reference has no serving
mode at all — its driver is a blocking frame loop
(Examples/RGB-D/rgbd_tum.cc:115-189)."""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline import batch as B


def test_depth12_roundtrip():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 65536, (64, 127), np.uint16)
    import jax.numpy as jnp

    dec = np.asarray(B.unpack_depth12(jnp.asarray(B.pack_depth12(raw)), 127))
    # 12-bit: exact up to the dropped 4 LSB
    assert dec.shape == (64, 127)
    assert np.abs(dec - raw.astype(np.float32)).max() < 16.0
    assert np.array_equal(dec, (raw & 0xFFF0).astype(np.float32))


def test_flow12_half_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    # smooth flow field + moderate gradient
    ys, xs = np.mgrid[0:64, 0:96].astype(np.float32)
    flow = np.stack([3.0 + xs * 0.05, -2.0 + ys * 0.03], -1)
    dec = np.asarray(B.unpack_flow12_half(jnp.asarray(B.pack_flow12_half(flow)), 64, 96))
    assert dec.shape == flow.shape
    # interior reconstruction error stays at the quantisation scale
    err = np.abs(dec - flow)[2:-2, 2:-2]
    assert err.max() < 0.25, err.max()


@pytest.mark.slow
def test_streaming_matches_batched(kitti_sample_dir):
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        padding=dataclasses.replace(
            DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=4096,
            k_obj_max=4,
        ),
        solver=dataclasses.replace(
            DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60,
            obj_lm_iters=100,
        ),
    )
    seq = KittiSequence(kitti_sample_dir)
    frames = [seq.load_frame(i) for i in range(5)]

    Tcw_b, res_b, rec_b = B.run_sequence_batched(frames, cfg)
    # chunk=3 over 4 pairs: exercises the carry handoff AND tail padding
    Tcw_s, res_s, rec_s = B.run_sequence_streaming(frames, cfg, chunk=3)

    assert Tcw_s.shape == Tcw_b.shape
    # same regime (wire v2 quantisation + identical solver): endpoints close
    E = Tcw_s[-1] @ np.linalg.inv(Tcw_b[-1])
    assert np.linalg.norm(E[:3, 3]) < 0.15, E[:3, 3]
    rel_s = np.asarray(res_s.cam_t_rpe_rel)
    rel_b = np.asarray(res_b.cam_t_rpe_rel)
    assert rel_s.shape == rel_b.shape
    assert abs(rel_s.mean() - rel_b.mean()) < 0.04, (rel_s, rel_b)

    # object records survive the wire: ids, speeds in range
    gt_rec = [r for r in rec_s if r["has_gt"]]
    assert gt_rec
    for r in gt_rec:
        assert abs(r["speed_est"] - r["speed_gt"]) < 25
