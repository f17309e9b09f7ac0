import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.solvers import horn
from multimot_track_tpu.solvers.ransac import ransac_rigid_pose

CAM = CameraConfig()
RNG = np.random.default_rng(7)


def test_horn_exact():
    src = RNG.normal(size=(32, 3)).astype(np.float32)
    xi = jnp.asarray([0.2, -0.1, 0.3, 1.0, 0.5, -0.2], jnp.float32)
    T = se3.exp_se3(xi)
    dst = np.asarray(se3.transform(T, jnp.asarray(src)))
    T_est = horn.rigid_align(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T), atol=1e-4)


def test_horn_batched():
    src = RNG.normal(size=(10, 3, 3)).astype(np.float32)
    xi = RNG.normal(scale=0.3, size=(10, 6)).astype(np.float32)
    T = se3.exp_se3(jnp.asarray(xi))
    dst = se3.transform_points(T, jnp.asarray(src))
    T_est = horn.rigid_align(jnp.asarray(src), dst)
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T), atol=2e-4)


def make_pnp_problem(n=400, outlier_frac=0.3, noise=0.0):
    uv = RNG.uniform([80, 40], [CAM.width - 80, CAM.height - 40], size=(n, 2)).astype(np.float32)
    z = RNG.uniform(4.0, 25.0, size=(n,)).astype(np.float32)
    Xw = np.asarray(camera.backproject(jnp.asarray(uv), jnp.asarray(z), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    xi = np.asarray([0.02, -0.04, 0.01, 0.4, -0.2, 1.1], np.float32)
    T_true = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    xyz_cur = np.array(se3.transform(jnp.asarray(T_true), jnp.asarray(Xw)))
    uv_cur = np.array(camera.project(jnp.asarray(xyz_cur), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    n_out = int(n * outlier_frac)
    bad = RNG.choice(n, size=n_out, replace=False)
    uv_cur[bad] += RNG.normal(scale=15.0, size=(n_out, 2))
    xyz_cur[bad] += RNG.normal(scale=2.0, size=(n_out, 3))
    if noise:
        uv_cur += RNG.normal(scale=noise, size=uv_cur.shape)
    return Xw, uv_cur.astype(np.float32), xyz_cur.astype(np.float32), T_true, bad


def test_ransac_rejects_outliers():
    Xw, uv_cur, xyz_cur, T_true, bad = make_pnp_problem()
    res = ransac_rigid_pose(
        jax.random.PRNGKey(0),
        jnp.asarray(Xw),
        jnp.asarray(uv_cur),
        jnp.asarray(xyz_cur),
        jnp.ones(Xw.shape[0], bool),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    E = np.asarray(res.T) @ np.linalg.inv(T_true)
    assert np.linalg.norm(E[:3, 3]) < 0.01
    inl = np.asarray(res.inliers)
    assert inl[bad].sum() == 0          # no outlier survives the 0.3px gate
    assert int(res.n_inliers) > 250


def test_ransac_respects_valid_mask():
    Xw, uv_cur, xyz_cur, T_true, _ = make_pnp_problem(outlier_frac=0.0)
    valid = np.zeros(Xw.shape[0], bool)
    valid[:100] = True
    res = ransac_rigid_pose(
        jax.random.PRNGKey(1),
        jnp.asarray(Xw), jnp.asarray(uv_cur), jnp.asarray(xyz_cur),
        jnp.asarray(valid), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    assert int(res.n_inliers) <= 100
    assert not np.asarray(res.inliers)[100:].any()
