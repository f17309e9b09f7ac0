"""Joint ego + multi-object window refinement on a synthetic scene."""

import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.solvers.multi_window_ba import (
    MultiWindowParams,
    refine_window,
)

CAM = CameraConfig()
RNG = np.random.default_rng(51)


def synth_multiwindow(F=4, K=1, N=256, M=128, noise_px=0.1):
    # static scene
    st_uv = RNG.uniform([100, 50], [CAM.width - 100, CAM.height - 50], (F - 1, N, 2)).astype(np.float32)
    st_z = RNG.uniform(6, 30, (F - 1, N)).astype(np.float32)
    # one object moving +1.0m in z per pair
    ob_uv = RNG.uniform([400, 120], [800, 280], (F - 1, K, M, 2)).astype(np.float32)
    ob_z = RNG.uniform(8, 15, (F - 1, K, M)).astype(np.float32)

    poses = [np.eye(4, dtype=np.float32)]
    rels = []
    for f in range(1, F):
        xi = np.asarray([0.002, 0.004, -0.001, 0.02, 0.01, 1.1], np.float32)
        rel = np.asarray(se3.exp_se3(jnp.asarray(xi)))
        rels.append(rel)
        poses.append((rel @ poses[-1]).astype(np.float32))
    poses = np.stack(poses)
    H_true = np.asarray(se3.exp_se3(jnp.asarray([0.0, 0.01, 0.0, 0.1, 0.0, 1.0], jnp.float32)))
    H_stack = np.tile(H_true, (F - 1, K, 1, 1)).astype(np.float32)

    # synthesize flows from the true model
    st_flow = np.zeros_like(st_uv)
    ob_flow = np.zeros_like(ob_uv)
    for f in range(F - 1):
        Twl = np.linalg.inv(poses[f])
        Tc = poses[f + 1]
        Xl = np.asarray(camera.backproject(jnp.asarray(st_uv[f]), jnp.asarray(st_z[f]), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
        Xw = (Twl[:3, :3] @ Xl.T).T + Twl[:3, 3]
        y = (Tc[:3, :3] @ Xw.T).T + Tc[:3, 3]
        st_flow[f] = np.asarray(camera.project(jnp.asarray(y), CAM.fx, CAM.fy, CAM.cx, CAM.cy)) - st_uv[f]
        for k in range(K):
            Xo = np.asarray(camera.backproject(jnp.asarray(ob_uv[f, k]), jnp.asarray(ob_z[f, k]), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
            Xw_o = (Twl[:3, :3] @ Xo.T).T + Twl[:3, 3]
            Xh = (H_true[:3, :3] @ Xw_o.T).T + H_true[:3, 3]
            yo = (Tc[:3, :3] @ Xh.T).T + Tc[:3, 3]
            ob_flow[f, k] = np.asarray(camera.project(jnp.asarray(yo), CAM.fx, CAM.fy, CAM.cx, CAM.cy)) - ob_uv[f, k]
    st_flow += RNG.normal(scale=noise_px, size=st_flow.shape)
    ob_flow += RNG.normal(scale=noise_px, size=ob_flow.shape)
    return poses, H_stack, st_uv, st_flow.astype(np.float32), st_z, ob_uv, ob_flow.astype(np.float32), ob_z


def test_joint_refinement_improves_both():
    F, K = 4, 1
    poses, H_stack, st_uv, st_flow, st_z, ob_uv, ob_flow, ob_z = synth_multiwindow(F, K)
    # perturb inits
    p_init = [poses[0]]
    for f in range(1, F):
        d = np.concatenate([RNG.normal(scale=0.002, size=3), RNG.normal(scale=0.03, size=3)]).astype(np.float32)
        p_init.append(np.asarray(se3.exp_se3(jnp.asarray(d))) @ poses[f])
    p_init = np.stack(p_init)
    h_init = np.empty_like(H_stack)
    for f in range(F - 1):
        d = np.concatenate([RNG.normal(scale=0.004, size=3), RNG.normal(scale=0.05, size=3)]).astype(np.float32)
        h_init[f, 0] = np.asarray(se3.exp_se3(jnp.asarray(d))) @ H_stack[f, 0]

    res = refine_window(
        jnp.asarray(p_init), jnp.asarray(h_init),
        jnp.ones((F - 1, K), bool),
        jnp.asarray(st_uv), jnp.asarray(st_flow), jnp.asarray(st_z),
        jnp.ones(st_uv.shape[:2], bool),
        jnp.asarray(ob_uv), jnp.asarray(ob_flow), jnp.asarray(ob_z),
        jnp.ones(ob_uv.shape[:3], bool),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy,
        params=MultiWindowParams(iters=10),
    )
    pe_b = np.mean([np.linalg.norm((p_init[f] @ np.linalg.inv(poses[f]))[:3, 3]) for f in range(1, F)])
    pe_a = np.mean([np.linalg.norm((np.asarray(res.poses[f]) @ np.linalg.inv(poses[f]))[:3, 3]) for f in range(1, F)])
    he_b = np.mean([np.linalg.norm((h_init[f, 0] @ np.linalg.inv(H_stack[f, 0]))[:3, 3]) for f in range(F - 1)])
    he_a = np.mean([np.linalg.norm((np.asarray(res.motions[f, 0]) @ np.linalg.inv(H_stack[f, 0]))[:3, 3]) for f in range(F - 1)])
    assert pe_a < 0.3 * pe_b, (pe_b, pe_a)
    assert he_a < 0.3 * he_b, (he_b, he_a)
