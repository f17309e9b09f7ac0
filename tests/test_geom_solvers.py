"""PnP / Sim3 / mono-initializer solver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.solvers import pnp, sim3
from multimot_track_tpu.solvers.initializer import initialize_mono

CAM = CameraConfig()
RNG = np.random.default_rng(13)


def scene(n=300):
    uv = RNG.uniform([100, 50], [CAM.width - 100, CAM.height - 50], (n, 2)).astype(np.float32)
    z = RNG.uniform(5, 30, (n,)).astype(np.float32)
    X = np.asarray(camera.backproject(jnp.asarray(uv), jnp.asarray(z), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    return uv, z, X


def test_dlt_pose_exact():
    uv, z, X = scene(64)
    xi = jnp.asarray([0.05, -0.03, 0.02, 0.5, -0.2, 0.8], jnp.float32)
    T = se3.exp_se3(xi)
    uv2 = np.asarray(camera.project(se3.transform(T, jnp.asarray(X)), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    T_est = pnp.dlt_pose(jnp.asarray(X), jnp.asarray(uv2), CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T), atol=1e-3)


def test_ransac_pnp_outliers():
    uv, z, X = scene(400)
    xi = jnp.asarray([0.02, -0.01, 0.03, 0.3, 0.1, 0.9], jnp.float32)
    T = se3.exp_se3(xi)
    uv2 = np.array(camera.project(se3.transform(T, jnp.asarray(X)), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    bad = RNG.choice(400, 120, replace=False)
    uv2[bad] += RNG.normal(scale=40, size=(120, 2))
    res = pnp.ransac_pnp(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(uv2),
        jnp.ones(400, bool), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    E = np.asarray(res.T) @ np.linalg.inv(np.asarray(T))
    assert np.linalg.norm(E[:3, 3]) < 0.02
    assert int(res.n_inliers) >= 250


def test_umeyama_with_scale():
    X1 = RNG.normal(size=(100, 3)).astype(np.float32)
    xi = jnp.asarray([0.3, -0.2, 0.1, 1.0, 2.0, -0.5], jnp.float32)
    T = np.asarray(se3.exp_se3(xi))
    s_true = 1.7
    X2 = s_true * (X1 @ T[:3, :3].T) + T[:3, 3]
    s, R, t = sim3.umeyama(jnp.asarray(X1), jnp.asarray(X2))
    assert abs(float(s) - s_true) < 1e-3
    np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)


def test_ransac_sim3():
    uv, z, X1 = scene(200)
    s_true = 1.25
    xi = jnp.asarray([0.05, 0.1, -0.02, 0.5, -0.3, 0.8], jnp.float32)
    T = np.asarray(se3.exp_se3(xi))
    X2 = s_true * (X1 @ T[:3, :3].T) + T[:3, 3]
    X2 += 2.5  # keep z positive-ish for projection scoring
    X2n = X2 + RNG.normal(scale=0.01, size=X2.shape)
    bad = RNG.choice(200, 40, replace=False)
    X2n[bad] += RNG.normal(scale=3.0, size=(40, 3))
    res = sim3.ransac_sim3(
        jax.random.PRNGKey(1), jnp.asarray(X1 + 2.5), jnp.asarray(X2n.astype(np.float32)),
        jnp.ones(200, bool), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    # scale recovered within a few percent despite outliers
    assert abs(float(res.scale) - s_true) < 0.1
    assert int(res.n_inliers) > 100


def test_mono_initializer():
    uv, z, X = scene(400)
    xi = jnp.asarray([0.01, -0.02, 0.005, 0.3, -0.05, 0.8], jnp.float32)
    T = se3.exp_se3(xi)
    uv2 = np.array(camera.project(se3.transform(T, jnp.asarray(X)), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    uv2 += RNG.normal(scale=0.3, size=uv2.shape)
    res = initialize_mono(
        jax.random.PRNGKey(2), jnp.asarray(uv), jnp.asarray(uv2.astype(np.float32)),
        jnp.ones(400, bool), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    assert bool(res.ok)
    assert not bool(res.used_homography)
    T_est = np.asarray(res.T21)
    T_true = np.asarray(T)
    # translation is up to scale: compare directions
    d_est = T_est[:3, 3] / np.linalg.norm(T_est[:3, 3])
    d_true = T_true[:3, 3] / np.linalg.norm(T_true[:3, 3])
    assert np.dot(d_est, d_true) > 0.995
    E = T_est[:3, :3] @ T_true[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(E) - 1) / 2, -1, 1)))
    assert ang < 0.5


def test_decompose_homography_recovers_motion():
    """H = K (R + t n^T / d) K^-1 must yield (R, t) among the 8 Faugeras
    candidates (src/Initializer.cc ReconstructH)."""
    from multimot_track_tpu.solvers.initializer import decompose_homography

    K = np.asarray(CAM.K, np.float32)
    xi = jnp.asarray([0.04, -0.03, 0.02, 0.3, -0.1, 0.5], jnp.float32)
    T = np.asarray(se3.exp_se3(xi))
    R_true, t_true = T[:3, :3], T[:3, 3]
    n_true = np.asarray([0.1, -0.05, 0.99])
    n_true /= np.linalg.norm(n_true)
    d = 12.0
    H = K @ (R_true + np.outer(t_true, n_true) / d) @ np.linalg.inv(K)

    Rs, ts, ns, ok = decompose_homography(jnp.asarray(H, jnp.float32), jnp.asarray(K))
    assert bool(ok)
    t_dir = t_true / np.linalg.norm(t_true)
    best_ang, best_tdot = 180.0, -1.0
    for R, t in zip(np.asarray(Rs), np.asarray(ts)):
        ang = np.degrees(np.arccos(np.clip((np.trace(R @ R_true.T) - 1) / 2, -1, 1)))
        if ang < best_ang:
            best_ang, best_tdot = ang, abs(float(np.dot(t, t_dir)))
    assert best_ang < 0.2, best_ang
    assert best_tdot > 0.99, best_tdot


def test_mono_initializer_planar_uses_homography():
    """A plane-DOMINANT scene must select the H model and recover the true
    motion via the Faugeras candidates.  (A perfectly planar scene is kept
    two-fold ambiguous and rejected — see the companion test below.)"""
    # 85% of points on the plane n.X = d, 15% off-plane to break the
    # Faugeras two-solution tie
    rng = np.random.default_rng(7)
    n_pl = np.asarray([0.05, -0.3, 0.95])
    n_pl /= np.linalg.norm(n_pl)
    d = 15.0
    uv = rng.uniform([150, 80], [CAM.width - 150, CAM.height - 80], (400, 2)).astype(np.float32)
    rays = np.asarray(camera.backproject(jnp.asarray(uv), jnp.ones(400, np.float32), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    z = d / (rays @ n_pl)
    z[340:] = rng.uniform(4, 8, (60,))         # off-plane subset
    X = rays * z[:, None]
    xi = jnp.asarray([0.02, -0.04, 0.01, 1.2, -0.3, 0.8], jnp.float32)
    T = np.asarray(se3.exp_se3(xi))
    uv2 = np.array(camera.project(se3.transform(jnp.asarray(T), jnp.asarray(X.astype(np.float32))), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    uv2 += rng.normal(scale=0.25, size=uv2.shape)
    res = initialize_mono(
        jax.random.PRNGKey(3), jnp.asarray(uv), jnp.asarray(uv2.astype(np.float32)),
        jnp.ones(400, bool), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    assert bool(res.ok)
    assert bool(res.used_homography)
    T_est = np.asarray(res.T21)
    d_est = T_est[:3, 3] / np.linalg.norm(T_est[:3, 3])
    d_true = T[:3, 3] / np.linalg.norm(T[:3, 3])
    assert np.dot(d_est, d_true) > 0.99
    Rd = T_est[:3, :3] @ T[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang


def test_mono_initializer_pure_plane_rejected():
    """A perfectly planar scene admits two exact Faugeras interpretations —
    the initializer must refuse to commit (the reference waits for more
    parallax / structure too)."""
    rng = np.random.default_rng(7)
    n_pl = np.asarray([0.05, -0.3, 0.95])
    n_pl /= np.linalg.norm(n_pl)
    uv = rng.uniform([150, 80], [CAM.width - 150, CAM.height - 80], (400, 2)).astype(np.float32)
    rays = np.asarray(camera.backproject(jnp.asarray(uv), jnp.ones(400, np.float32), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    z = 15.0 / (rays @ n_pl)
    X = rays * z[:, None]
    T = np.asarray(se3.exp_se3(jnp.asarray([0.02, -0.04, 0.01, 0.4, -0.1, 0.6], jnp.float32)))
    uv2 = np.array(camera.project(se3.transform(jnp.asarray(T), jnp.asarray(X.astype(np.float32))), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    uv2 += rng.normal(scale=0.25, size=uv2.shape)
    res = initialize_mono(
        jax.random.PRNGKey(3), jnp.asarray(uv), jnp.asarray(uv2.astype(np.float32)),
        jnp.ones(400, bool), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    assert bool(res.used_homography)
    assert not bool(res.ok)
