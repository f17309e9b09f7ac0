import numpy as np
import jax.numpy as jnp
import pytest

from multimot_track_tpu.io import flowio, kitti
from multimot_track_tpu.frontend import fast, sampling
from multimot_track_tpu.geometry import camera
from multimot_track_tpu.config import DEFAULT_CONFIG


def test_flo_roundtrip(tmp_path):
    f = np.random.default_rng(0).normal(size=(10, 14, 2)).astype(np.float32)
    p = tmp_path / "x.flo"
    flowio.write_flo(p, f)
    g = flowio.read_flo(p)
    np.testing.assert_array_equal(f, g)


def test_read_reference_flo(kitti_sample_dir):
    f = flowio.read_flo(kitti_sample_dir / "flow" / "000000.flo")
    assert f.shape == (375, 1242, 2)
    assert np.isfinite(f).all()


def test_kitti_sequence(kitti_sample_dir):
    seq = kitti.KittiSequence(kitti_sample_dir)
    assert len(seq) == 5
    fr = seq.load_frame(0)
    assert fr.gray.shape == (375, 1242)
    assert fr.depth_raw.dtype == np.float32
    assert fr.sem_mask.max() <= 3 and fr.sem_mask.min() >= 0
    assert set(np.unique(fr.sem_mask)) >= {0}
    assert fr.obj_ids_gt.size >= 1
    # pose_gt frame0 is identity on disk
    np.testing.assert_allclose(fr.pose_gt, np.eye(4), atol=1e-6)
    # object pose parsing: R must be a rotation
    for T in fr.obj_poses_gt:
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-5)


def test_fast_detects_corners():
    img = np.zeros((64, 96), np.float32)
    img[20:40, 30:60] = 200.0  # a bright rectangle: 4 corners
    kp = fast.detect_pyramid(jnp.asarray(img), n_levels=1, n_total=64, cell=16, per_cell=4)
    uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
    assert len(uv) >= 4
    corners = np.array([[30, 20], [59, 20], [30, 39], [59, 39]])
    for c in corners:
        assert np.min(np.linalg.norm(uv - c, axis=1)) < 3.0, c


def test_sampling_dense_objects():
    H, W = 64, 96
    depth = np.full((H, W), 10.0, np.float32)
    mask = np.zeros((H, W), np.int32)
    mask[16:48, 32:64] = 2
    flow = np.full((H, W, 2), 1.5, np.float32)
    s = sampling.sample_dense_objects(
        jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(flow), step=4, n_max=256
    )
    n = int(jnp.sum(s.valid))
    assert n == 8 * 8  # 32/4 x 32/4 grid points inside the mask
    uv = np.asarray(s.uv[:n])
    assert uv[:, 0].min() >= 32 and uv[:, 0].max() < 64
    assert (np.asarray(s.label[:n]) == 2).all()
    np.testing.assert_allclose(np.asarray(s.corres[:n]), uv + 1.5)


def test_sampling_static_filters():
    H, W = 64, 96
    depth = np.full((H, W), 10.0, np.float32)
    depth[:, 80:] = 50.0           # too deep
    mask = np.zeros((H, W), np.int32)
    mask[:, :20] = 1               # on-object -> excluded
    flow = np.full((H, W, 2), 2.0, np.float32)
    kp_uv = jnp.asarray([[10.0, 10.0], [40.0, 30.0], [85.0, 30.0], [40.0, 60.0]])
    kp_valid = jnp.asarray([True, True, True, True])
    s = sampling.sample_static(
        kp_uv, kp_valid, jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(flow), n_max=16
    )
    n = int(jnp.sum(s.valid))
    assert n == 2  # on-mask and too-deep are dropped; (40,30) and (40,60) kept
    kept = np.asarray(s.uv[:n])
    assert {tuple(map(float, k)) for k in kept} == {(40.0, 30.0), (40.0, 60.0)}


def test_sample_real_frame(kitti_sample_dir):
    seq = kitti.KittiSequence(kitti_sample_dir)
    fr = seq.load_frame(0)
    cam = DEFAULT_CONFIG.camera
    depth = np.asarray(camera.disparity_png_to_depth(jnp.asarray(fr.depth_raw), cam.bf))
    s = sampling.sample_dense_objects(
        jnp.asarray(depth), jnp.asarray(fr.sem_mask), jnp.asarray(fr.flow),
        step=4, n_max=DEFAULT_CONFIG.padding.n_obj_pts_max,
    )
    n = int(jnp.sum(s.valid))
    assert n > 100  # the sample sequence has at least one close object
    labels = np.unique(np.asarray(s.label)[np.asarray(s.valid)])
    assert all(l in (1, 2, 3) for l in labels)
