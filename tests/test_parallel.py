"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.parallel import dist_ba, mesh as meshmod, pairwise
from multimot_track_tpu.solvers.flow_ba import FlowBAParams, solve_flow_ba

CAM = CameraConfig()
RNG = np.random.default_rng(3)


def synth(n=1024, noise=0.1):
    uv = RNG.uniform([80, 40], [CAM.width - 80, CAM.height - 40], size=(n, 2)).astype(np.float32)
    z = RNG.uniform(4.0, 30.0, size=(n,)).astype(np.float32)
    X = np.asarray(camera.backproject(jnp.asarray(uv), jnp.asarray(z), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    xi = RNG.normal(scale=0.05, size=6).astype(np.float32) * np.asarray([1, 1, 1, 5, 5, 5], np.float32)
    T_true = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    uv_cur = np.asarray(camera.project(se3.transform(jnp.asarray(T_true), jnp.asarray(X)), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    flow = (uv_cur - uv + RNG.normal(scale=noise, size=(n, 2))).astype(np.float32)
    return uv, z, flow, T_true


def test_distributed_matches_single_chip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    uv, z, flow, T_true = synth()
    params = FlowBAParams(iters=50)
    m = meshmod.make_mesh(8, axis=meshmod.POINT_AXIS)
    dist = dist_ba.make_distributed_flow_ba(m, params, CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    eye = jnp.eye(4)
    valid = jnp.ones(uv.shape[0], bool)
    T_d = dist(eye, eye, jnp.asarray(uv), jnp.asarray(flow), jnp.asarray(z), valid)
    T_s = solve_flow_ba(
        eye, eye, jnp.asarray(uv), jnp.asarray(flow), jnp.asarray(z), valid,
        CAM.fx, CAM.fy, CAM.cx, CAM.cy, params=params,
    ).T
    np.testing.assert_allclose(np.asarray(T_d), np.asarray(T_s), atol=5e-4)
    E = np.asarray(T_d) @ np.linalg.inv(T_true)
    assert np.linalg.norm(E[:3, 3]) < 0.05


def test_pairwise_batch_and_compose():
    import dataclasses

    from multimot_track_tpu.config import DEFAULT_CONFIG

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        solver=dataclasses.replace(DEFAULT_CONFIG.solver, ransac_iters=64, cam_lm_iters=40),
    )
    B, N = 4, 256
    uvs, zs, flows, Ts = [], [], [], []
    for _ in range(B):
        uv, z, flow, T = synth(n=N, noise=0.0)
        uvs.append(uv); zs.append(z); flows.append(flow); Ts.append(T)
    uv = jnp.asarray(np.stack(uvs))
    z = jnp.asarray(np.stack(zs))
    flow = jnp.asarray(np.stack(flows))
    cur_uv = uv + flow
    # current depth: z of the moved points
    cur_z = []
    for k in range(B):
        X = camera.backproject(uv[k], z[k], CAM.fx, CAM.fy, CAM.cx, CAM.cy)
        Xc = se3.transform(jnp.asarray(Ts[k]), X)
        cur_z.append(Xc[..., 2])
    cur_z = jnp.stack(cur_z)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    valid = jnp.ones((B, N), bool)
    T_rel = pairwise.solve_relative_batch(
        keys, uv, flow, z, cur_uv, cur_z, valid, cfg
    )
    for k in range(B):
        E = np.asarray(T_rel[k]) @ np.linalg.inv(Ts[k])
        assert np.linalg.norm(E[:3, 3]) < 5e-3, k
    traj = pairwise.compose_trajectory(T_rel)
    assert traj.shape == (B + 1, 4, 4)
    ref = np.eye(4)
    for k in range(B):
        ref = np.asarray(T_rel[k]) @ ref
    np.testing.assert_allclose(np.asarray(traj[-1]), ref, atol=1e-4)


def test_distributed_window_ba_matches_single_chip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sys
    sys.path.insert(0, "tests")
    from test_window_ba import make_window

    from multimot_track_tpu.parallel import dist_window_ba
    from multimot_track_tpu.solvers.window_ba import WindowBAParams, solve_window_ba

    uv, alive, z_meas, init, poses_true, _ = make_window(N=512)
    params = WindowBAParams(iters=20)
    single = solve_window_ba(
        jnp.asarray(init), jnp.asarray(uv), jnp.asarray(alive), jnp.asarray(z_meas),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy, params=params,
    )
    m = meshmod.make_mesh(8, axis=meshmod.POINT_AXIS)
    dist = dist_window_ba.make_distributed_window_ba(m, params, CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    poses_d, rho_d = dist(
        jnp.asarray(init), jnp.asarray(uv), jnp.asarray(alive), jnp.asarray(z_meas)
    )
    np.testing.assert_allclose(np.asarray(poses_d), np.asarray(single.poses), atol=2e-3)
