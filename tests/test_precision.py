"""float32-vs-float64 numerical parity of the solver chain (SURVEY.md §7:
the chi2 gates 0.04/0.01 are tight, so float32 must not move solutions or
flip inlier classifications meaningfully vs a float64 reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.solvers import flow_ba

CAM = CameraConfig()
RNG = np.random.default_rng(17)


def synth(n=1024, noise_px=0.3):
    uv = RNG.uniform([80, 40], [CAM.width - 80, CAM.height - 40], (n, 2))
    z = RNG.uniform(4.0, 30.0, n)
    X = np.asarray(camera.backproject(
        jnp.asarray(uv, jnp.float32), jnp.asarray(z, jnp.float32),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    xi = np.asarray([0.003, -0.002, 0.001, 0.04, -0.02, 1.1])
    T_true = np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32)))
    uv1 = np.asarray(camera.project(
        se3.transform(jnp.asarray(T_true, jnp.float32), jnp.asarray(X, jnp.float32)),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    flow = uv1 - uv + RNG.normal(scale=noise_px, size=(n, 2))
    return uv, z, flow, T_true


def _solve(dtype):
    uv, z, flow, T_true = synth()
    params = flow_ba.FlowBAParams(iters=60)
    out = flow_ba.solve_flow_ba(
        jnp.eye(4, dtype=dtype), jnp.eye(4, dtype=dtype),
        jnp.asarray(uv, dtype), jnp.asarray(flow, dtype),
        jnp.asarray(z, dtype), jnp.ones(uv.shape[0], bool),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy, params,
    )
    return np.asarray(out.T, np.float64), np.asarray(out.chi2, np.float64), T_true


def test_flow_ba_f32_matches_f64():
    global RNG
    jax.config.update("jax_enable_x64", True)
    try:
        # same RNG stream for both: reseed the module generator
        RNG = np.random.default_rng(17)
        T64, chi64, T_true = _solve(jnp.float64)
        RNG = np.random.default_rng(17)
        T32, chi32, _ = _solve(jnp.float32)
    finally:
        jax.config.update("jax_enable_x64", False)
    # pose agreement far inside the chi2 gate's discrimination
    assert np.abs(T32 - T64).max() < 1e-4, np.abs(T32 - T64).max()
    # inlier classification at the tight camera gate (0.04) flips on at
    # most a handful of borderline points
    flips = int(np.sum((chi32 < 0.04) != (chi64 < 0.04)))
    assert flips <= 5, flips
    # and both recover the true motion
    assert np.abs(T64 - T_true).max() < 5e-3
