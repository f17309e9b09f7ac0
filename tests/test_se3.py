"""SE(3) kernel unit tests vs closed form / scipy (SURVEY.md §4 test pyramid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from multimot_track_tpu.geometry import se3

RNG = np.random.default_rng(0)


def random_T(n=None):
    shape = () if n is None else (n,)
    rot = Rotation.random(n, random_state=RNG)
    R = rot.as_matrix().astype(np.float32)
    t = RNG.normal(size=shape + (3,)).astype(np.float32)
    return np.asarray(se3.make_T(jnp.asarray(R), jnp.asarray(t)))


def test_exp_log_roundtrip():
    xi = jnp.asarray(RNG.normal(scale=0.5, size=(64, 6)), jnp.float32)
    T = se3.exp_se3(xi)
    xi2 = se3.log_se3(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=5e-4)


def test_exp_matches_scipy():
    omega = RNG.normal(scale=1.0, size=(32, 3)).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(omega))
    R_ref = Rotation.from_rotvec(omega).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


def test_exp_small_angle():
    omega = jnp.asarray([[1e-9, 0, 0], [0.0, 0.0, 0.0]], jnp.float32)
    R = se3.exp_so3(omega)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_inverse():
    T = jnp.asarray(random_T(16))
    eye = T @ se3.inverse(T)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)


def test_transform_points():
    T = jnp.asarray(random_T())
    pts = jnp.asarray(RNG.normal(size=(100, 3)), jnp.float32)
    out = se3.transform(T, pts)
    ref = (np.asarray(T)[:3, :3] @ np.asarray(pts).T).T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_rotation_angle():
    angles = np.array([0.0, 0.1, 0.5, 1.5], np.float32)
    R = Rotation.from_rotvec(np.outer(angles, [0, 1, 0])).as_matrix().astype(np.float32)
    deg = se3.rotation_angle_deg(jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(deg), np.degrees(angles), rtol=1e-4, atol=1e-3)


def test_jit_grad_compatible():
    f = jax.jit(lambda xi: jnp.sum(se3.exp_se3(xi)[..., :3, 3]))
    g = jax.grad(f)(jnp.ones((6,), jnp.float32) * 0.1)
    assert np.all(np.isfinite(np.asarray(g)))


def test_euler_y():
    yaw = jnp.asarray([0.3], jnp.float32)
    R = se3.euler_y_to_R(yaw)[0]
    ref = Rotation.from_euler("y", 0.3).as_matrix()
    np.testing.assert_allclose(np.asarray(R), ref, atol=1e-6)
