"""Solver convergence tests on synthetic rigid scenes (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.solvers.flow_ba import FlowBAParams, solve_flow_ba

CAM = CameraConfig()
RNG = np.random.default_rng(42)


def synth_scene(n=512, pose_scale=0.05, trans_scale=1.0, noise_px=0.0, n_pad=0):
    """Last camera at world origin (Twl = I); random points; true current pose."""
    uv = RNG.uniform([80, 40], [CAM.width - 80, CAM.height - 40], size=(n, 2)).astype(np.float32)
    z = RNG.uniform(4.0, 30.0, size=(n,)).astype(np.float32)
    X = np.asarray(camera.backproject(jnp.asarray(uv), jnp.asarray(z), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    xi = np.concatenate([
        RNG.normal(scale=pose_scale, size=3),
        RNG.normal(scale=trans_scale, size=3),
    ]).astype(np.float32)
    T_true = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    uv_cur = np.asarray(
        camera.project(se3.transform(jnp.asarray(T_true), jnp.asarray(X)), CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    )
    flow = uv_cur - uv + RNG.normal(scale=noise_px, size=(n, 2)).astype(np.float32)
    valid = np.ones(n, bool)
    if n_pad:
        uv = np.concatenate([uv, np.zeros((n_pad, 2), np.float32)])
        z = np.concatenate([z, np.zeros(n_pad, np.float32)])
        flow = np.concatenate([flow, np.zeros((n_pad, 2), np.float32)])
        valid = np.concatenate([valid, np.zeros(n_pad, bool)])
    return uv, z, flow, T_true


def run_solver(uv, z, flow, T_init=np.eye(4, dtype=np.float32), **kw):
    valid = kw.pop("valid", np.ones(uv.shape[0], bool))
    params = kw.pop("params", FlowBAParams())
    return solve_flow_ba(
        jnp.asarray(T_init),
        jnp.eye(4),
        jnp.asarray(uv),
        jnp.asarray(flow),
        jnp.asarray(z),
        jnp.asarray(valid),
        CAM.fx,
        CAM.fy,
        CAM.cx,
        CAM.cy,
        params=params,
    )


def pose_err(T_est, T_true):
    E = np.asarray(T_est) @ np.linalg.inv(np.asarray(T_true))
    t_err = np.linalg.norm(E[:3, 3])
    r_err = np.degrees(
        np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1))
    )
    return t_err, r_err


def test_noise_free_recovery():
    uv, z, flow, T_true = synth_scene(noise_px=0.0)
    res = run_solver(uv, z, flow)
    t_err, r_err = pose_err(res.T, T_true)
    assert t_err < 2e-3, t_err
    assert r_err < 0.02, r_err
    assert int(res.n_inliers) > 500


def test_noisy_recovery():
    uv, z, flow, T_true = synth_scene(noise_px=0.3)
    res = run_solver(uv, z, flow)
    t_err, r_err = pose_err(res.T, T_true)
    assert t_err < 0.12, t_err
    assert r_err < 0.25, r_err


def test_padding_invariance():
    uv, z, flow, T_true = synth_scene(n=256, noise_px=0.1)
    res_a = run_solver(uv, z, flow)
    uvp, zp, flowp, _ = synth_scene(n=256, noise_px=0.1)
    # same scene padded with garbage rows that are masked out
    n_pad = 64
    uv2 = np.concatenate([uv, RNG.uniform(0, 100, (n_pad, 2)).astype(np.float32)])
    z2 = np.concatenate([z, np.full(n_pad, 5.0, np.float32)])
    fl2 = np.concatenate([flow, RNG.normal(size=(n_pad, 2)).astype(np.float32)])
    valid = np.concatenate([np.ones(256, bool), np.zeros(n_pad, bool)])
    res_b = run_solver(uv2, z2, fl2, valid=valid)
    np.testing.assert_allclose(np.asarray(res_b.T), np.asarray(res_a.T), atol=1e-5)


def test_outlier_robustness():
    uv, z, flow, T_true = synth_scene(n=512, noise_px=0.1)
    flow_bad = flow.copy()
    bad = RNG.choice(512, size=50, replace=False)
    flow_bad[bad] += RNG.normal(scale=20.0, size=(50, 2))
    res = run_solver(uv, z, flow_bad)
    t_err, r_err = pose_err(res.T, T_true)
    assert t_err < 0.1, t_err
    # outliers should be gated out
    assert int(jnp.sum(res.inliers[bad])) < 10


def test_object_style_motion():
    """P = Tcw_cur @ H composition: recover a translating object's motion."""
    uv, z, flow, _ = synth_scene(n=256, pose_scale=0.0, trans_scale=0.0, noise_px=0.0)
    # object moves +1.2m in world z; camera stays at origin
    H = np.eye(4, dtype=np.float32)
    H[2, 3] = 1.2
    X = np.asarray(camera.backproject(jnp.asarray(uv), jnp.asarray(z), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    uv_cur = np.asarray(camera.project(se3.transform(jnp.asarray(H), jnp.asarray(X)), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    flow_obj = uv_cur - uv
    res = run_solver(uv, z, flow_obj, params=FlowBAParams(prior_info=0.5, rp_thres=0.01, iters=200))
    # camera is identity so recovered P == H_world
    t_err, r_err = pose_err(res.T, H)
    assert t_err < 5e-3, t_err
    assert r_err < 0.05, r_err
