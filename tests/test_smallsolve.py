"""Unrolled tiny SPD solves vs numpy reference (geometry/smallsolve.py)."""

import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.geometry import se3, smallsolve

RNG = np.random.default_rng(7)


def _spd(n, batch):
    A = RNG.normal(size=batch + (n, n)).astype(np.float32)
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n, dtype=np.float32)


def test_solve_spd6_matches_numpy():
    H = _spd(6, (48,))
    g = RNG.normal(size=(48, 6)).astype(np.float32)
    x = np.asarray(smallsolve.solve_spd6(jnp.asarray(H), jnp.asarray(g)))
    x_ref = np.linalg.solve(H, g[..., None])[..., 0]
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-4)


def test_solve_spd3_and_inv_spd3():
    H = _spd(3, (512,))
    g = RNG.normal(size=(512, 3)).astype(np.float32)
    x = np.asarray(smallsolve.solve_spd3(jnp.asarray(H), jnp.asarray(g)))
    np.testing.assert_allclose(x, np.linalg.solve(H, g[..., None])[..., 0],
                               rtol=2e-3, atol=2e-4)
    Hi = np.asarray(smallsolve.inv_spd3(jnp.asarray(H)))
    np.testing.assert_allclose(Hi, np.linalg.inv(H), rtol=2e-3, atol=2e-4)


def test_log_se3_closed_form_jacobian_inverse():
    # exp/log roundtrip exercises _so3_left_jacobian_inv across magnitudes
    xi = RNG.normal(scale=0.8, size=(256, 6)).astype(np.float32)
    xi[0] = 0.0
    xi[1] = [1e-6, 0, 0, 0.3, -0.2, 0.1]
    back = np.asarray(se3.log_se3(se3.exp_se3(jnp.asarray(xi))))
    np.testing.assert_allclose(back, xi, rtol=1e-4, atol=1e-5)
