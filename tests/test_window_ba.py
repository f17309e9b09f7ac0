"""Windowed BA on synthetic multi-frame scenes."""

import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.solvers.window_ba import WindowBAParams, solve_window_ba

CAM = CameraConfig()
RNG = np.random.default_rng(21)


def make_window(F=5, N=512, obs_noise=0.1, pose_perturb=0.02, depth_noise=0.05):
    uv0 = RNG.uniform([80, 40], [CAM.width - 80, CAM.height - 40], (N, 2)).astype(np.float32)
    z = RNG.uniform(5.0, 35.0, (N,)).astype(np.float32)
    X = np.asarray(camera.backproject(jnp.asarray(uv0), jnp.asarray(z), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    # forward motion ~1.2 m/frame + small rotation
    poses = [np.eye(4, dtype=np.float32)]
    for f in range(1, F):
        xi = np.concatenate([
            RNG.normal(scale=0.003, size=3),
            [0.01 * f, 0.005 * f, 1.2 * f + RNG.normal(scale=0.01)],
        ]).astype(np.float32)
        poses.append(np.asarray(se3.exp_se3(jnp.asarray(xi))))
    poses = np.stack(poses)
    uv = [uv0]
    alive = [np.ones(N, bool)]
    for f in range(1, F):
        y = np.asarray(se3.transform(jnp.asarray(poses[f]), jnp.asarray(X)))
        u = np.asarray(camera.project(jnp.asarray(y), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
        u = u + RNG.normal(scale=obs_noise, size=u.shape)
        ok = (u[:, 0] > 5) & (u[:, 0] < CAM.width - 5) & (u[:, 1] > 5) & (u[:, 1] < CAM.height - 5)
        uv.append(u.astype(np.float32))
        alive.append(ok)
    # perturbed initial poses + noisy depth
    init = [np.eye(4, dtype=np.float32)]
    for f in range(1, F):
        d = np.concatenate([
            RNG.normal(scale=pose_perturb * 0.1, size=3),
            RNG.normal(scale=pose_perturb, size=3),
        ]).astype(np.float32)
        init.append(np.asarray(se3.exp_se3(jnp.asarray(d))) @ poses[f])
    z_meas = z * (1 + RNG.normal(scale=depth_noise, size=z.shape)).astype(np.float32)
    return (
        np.stack(uv), np.stack(alive), z_meas.astype(np.float32),
        np.stack(init), poses, z,
    )


def test_window_ba_refines_poses():
    uv, alive, z_meas, init, poses_true, z_true = make_window()
    res = solve_window_ba(
        jnp.asarray(init), jnp.asarray(uv), jnp.asarray(alive), jnp.asarray(z_meas),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy, params=WindowBAParams(iters=30),
    )
    e0s, e1s = [], []
    for f in range(1, uv.shape[0]):
        E0 = init[f] @ np.linalg.inv(poses_true[f])
        E1 = np.asarray(res.poses[f]) @ np.linalg.inv(poses_true[f])
        e0s.append(np.linalg.norm(E0[:3, 3]))
        e1s.append(np.linalg.norm(E1[:3, 3]))
    # window BA must substantially improve the trajectory as a whole and
    # never blow a single frame up (later frames carry fewer live tracks)
    assert np.mean(e1s) < 0.6 * np.mean(e0s), (e0s, e1s)
    assert max(e1s) < 2.0 * max(e0s)


def test_window_ba_improves_depth():
    uv, alive, z_meas, init, poses_true, z_true = make_window(depth_noise=0.1)
    res = solve_window_ba(
        jnp.asarray(init), jnp.asarray(uv), jnp.asarray(alive), jnp.asarray(z_meas),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy, params=WindowBAParams(iters=30),
    )
    z_est = 1.0 / np.asarray(res.inv_depth)
    err_meas = np.abs(z_meas - z_true) / z_true
    err_est = np.abs(z_est - z_true) / z_true
    assert np.median(err_est) < np.median(err_meas)


def test_window_ba_handles_dead_tracks():
    uv, alive, z_meas, init, poses_true, _ = make_window()
    alive[2:, ::3] = False  # a third of tracks die after frame 1
    res = solve_window_ba(
        jnp.asarray(init), jnp.asarray(uv), jnp.asarray(alive), jnp.asarray(z_meas),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    assert np.all(np.isfinite(np.asarray(res.poses)))
    E = np.asarray(res.poses[-1]) @ np.linalg.inv(poses_true[-1])
    assert np.linalg.norm(E[:3, 3]) < 0.05
