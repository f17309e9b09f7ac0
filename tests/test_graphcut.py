"""Motion-segmentation MRF tests: energy semantics + two-motion separation."""

import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.ops import graphcut

CAM = CameraConfig()
RNG = np.random.default_rng(5)


def two_motion_scene(n_per=128):
    """Two clusters of points moving with different rigid motions."""
    uv_a = RNG.uniform([150, 100], [500, 300], (n_per, 2)).astype(np.float32)
    uv_b = RNG.uniform([700, 100], [1100, 300], (n_per, 2)).astype(np.float32)
    uv = np.concatenate([uv_a, uv_b])
    z = RNG.uniform(8, 20, (2 * n_per,)).astype(np.float32)
    X = np.asarray(camera.backproject(jnp.asarray(uv), jnp.asarray(z), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    H_a = np.asarray(se3.exp_se3(jnp.asarray([0.0, 0.0, 0.0, 0.3, 0.0, 1.0], jnp.float32)))
    H_b = np.asarray(se3.exp_se3(jnp.asarray([0.0, 0.02, 0.0, -0.8, 0.1, 0.4], jnp.float32)))
    Xc = np.concatenate([
        np.asarray(se3.transform(jnp.asarray(H_a), jnp.asarray(X[:n_per]))),
        np.asarray(se3.transform(jnp.asarray(H_b), jnp.asarray(X[n_per:]))),
    ])
    uv_cur = np.asarray(camera.project(jnp.asarray(Xc), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    return uv, X, Xc.astype(np.float32), uv_cur.astype(np.float32), n_per


def test_knn_graph():
    uv = jnp.asarray(RNG.uniform(0, 100, (64, 2)).astype(np.float32))
    valid = jnp.ones(64, bool)
    g = graphcut.build_knn_graph(uv, valid, k=4)
    assert g.nbr_idx.shape == (64, 4)
    # no self-loops
    assert not np.any(np.asarray(g.nbr_idx) == np.arange(64)[:, None])
    assert np.all(np.asarray(g.nbr_w) >= 0)


def test_two_motion_segmentation():
    uv, Xw, Xc, uv_cur, n_per = two_motion_scene()
    N = uv.shape[0]
    valid = jnp.ones(N, bool)
    g = graphcut.build_knn_graph(jnp.asarray(uv_cur), valid, k=6)
    hyp = graphcut.sample_motion_hypotheses(
        jax.random.PRNGKey(0), g, jnp.asarray(Xw), jnp.asarray(Xc), n_hyp=16
    )
    keep = graphcut.dedupe_hypotheses(hyp)
    D = graphcut.data_costs(hyp, jnp.asarray(Xw), jnp.asarray(uv_cur), CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    D = jnp.where(keep[None, :], D, 1e9)
    labels, energy = graphcut.segment(D, g)
    lab = np.asarray(labels)
    # points within each true cluster should agree on a label
    la = np.bincount(lab[:n_per]).argmax()
    lb = np.bincount(lab[n_per:]).argmax()
    assert la != lb
    assert (lab[:n_per] == la).mean() > 0.9
    assert (lab[n_per:] == lb).mean() > 0.9
    assert float(energy) < graphcut.LAMBDA * graphcut.COST_CAP * N * 0.5


def test_energy_decreases_with_consistency():
    uv, Xw, Xc, uv_cur, n_per = two_motion_scene(n_per=64)
    N = uv.shape[0]
    valid = jnp.ones(N, bool)
    g = graphcut.build_knn_graph(jnp.asarray(uv_cur), valid, k=6)
    hyp = graphcut.sample_motion_hypotheses(
        jax.random.PRNGKey(1), g, jnp.asarray(Xw), jnp.asarray(Xc), n_hyp=8
    )
    D = graphcut.data_costs(hyp, jnp.asarray(Xw), jnp.asarray(uv_cur), CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    labels, energy = graphcut.segment(D, g)
    rand = jnp.asarray(RNG.integers(0, 8, N).astype(np.int32))
    e_rand = graphcut.total_energy(rand, D, g)
    assert float(energy) < float(e_rand)
