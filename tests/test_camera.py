import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.geometry import camera
from multimot_track_tpu.config import CameraConfig

CAM = CameraConfig()


def test_project_backproject_roundtrip():
    rng = np.random.default_rng(1)
    uv = jnp.asarray(rng.uniform([0, 0], [CAM.width, CAM.height], size=(256, 2)), jnp.float32)
    z = jnp.asarray(rng.uniform(1.0, 40.0, size=(256,)), jnp.float32)
    xyz = camera.backproject(uv, z, CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    uv2 = camera.project(xyz, CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)


def test_disparity_to_depth():
    raw = jnp.asarray([[256.0 * 5.0, 0.0]])  # disparity 5 px, and invalid
    depth = camera.disparity_png_to_depth(raw, CAM.bf)
    assert np.isclose(float(depth[0, 0]), CAM.bf / 5.0)
    assert np.isinf(float(depth[0, 1]))


def test_nearest_sample_bounds():
    img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    vals, inb = camera.nearest_sample(img, jnp.asarray([[1.2, 1.6], [-3.0, 1.0], [3.6, 2.4]]))
    assert float(vals[0]) == img[2, 1]
    assert not bool(inb[1])
    assert not bool(inb[2])  # round(3.6)=4 == W -> out per reference's strict <


def test_bilinear():
    img = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
    v = camera.bilinear_sample(img, jnp.asarray([0.5, 0.5]))
    assert np.isclose(float(v), 1.5)
