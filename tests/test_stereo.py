import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.frontend import stereo

RNG = np.random.default_rng(17)


def make_pair(H=96, W=256, d_left=6, d_right=12):
    """Right image = left shifted by a per-region disparity."""
    left = RNG.uniform(0, 255, (H, W)).astype(np.float32)
    # smooth a bit so SAD has a basin
    k = np.ones(3) / 3
    for ax in (0, 1):
        left = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), ax, left)
    right = np.zeros_like(left)
    mid = W // 2
    right[:, : mid] = np.roll(left, -d_left, axis=1)[:, : mid]
    right[:, mid:] = np.roll(left, -d_right, axis=1)[:, mid:]
    return left.astype(np.float32), right.astype(np.float32), mid


def test_dense_disparity_two_regions():
    left, right, mid = make_pair()
    disp = np.asarray(stereo.dense_disparity(jnp.asarray(left), jnp.asarray(right), max_disp=32))
    # interior of each region (skip boundaries and the seam)
    a = disp[20:-20, 30 : mid - 20]
    b = disp[20:-20, mid + 30 : -20]
    assert np.median(np.abs(a[a > 0] - 6)) < 1.0
    assert np.median(np.abs(b[b > 0] - 12)) < 1.0


def test_keypoint_disparity():
    left, right, mid = make_pair()
    uv = jnp.asarray([[60.0, 40.0], [200.0, 50.0]])
    d, ok = stereo.keypoint_disparity(jnp.asarray(left), jnp.asarray(right), uv, max_disp=32)
    assert bool(ok[0]) and bool(ok[1])
    assert abs(float(d[0]) - 6) < 1.0
    assert abs(float(d[1]) - 12) < 1.0


def test_depth_raw_encoding():
    disp = jnp.asarray([[4.0, 0.0]])
    raw = np.asarray(stereo.disparity_to_depth_raw(disp))
    assert raw[0, 0] == 4.0 * 256.0
    assert raw[0, 1] == 0.0
