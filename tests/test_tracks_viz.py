import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.frontend import tracks
from multimot_track_tpu.viz import render


def test_chain_tracks_synthetic():
    H, W, F = 64, 96, 4
    flow = np.zeros((F - 1, H, W, 2), np.float32)
    flow[..., 0] = 2.0  # uniform 2px/frame rightward
    masks = np.zeros((F, H, W), np.int32)
    uv0 = jnp.asarray([[10.0, 30.0], [90.0, 30.0]])
    valid0 = jnp.asarray([True, True])
    tr = tracks.chain_tracks(uv0, valid0, jnp.asarray(flow), jnp.asarray(masks))
    assert tr.uv.shape == (F, 2, 2)
    np.testing.assert_allclose(np.asarray(tr.uv[-1, 0]), [16.0, 30.0], atol=1e-4)
    # second point walks off the right edge and dies
    assert bool(tr.alive[0, 1])
    assert not bool(tr.alive[-1, 1])


def test_chain_tracks_dies_on_mask():
    H, W, F = 32, 32, 3
    flow = np.zeros((F - 1, H, W, 2), np.float32)
    masks = np.zeros((F, H, W), np.int32)
    masks[1, :, :] = 1  # everything masked in frame 1
    tr = tracks.chain_tracks(
        jnp.asarray([[16.0, 16.0]]), jnp.asarray([True]),
        jnp.asarray(flow), jnp.asarray(masks),
    )
    assert not bool(tr.alive[1, 0])


def test_link_detections():
    F, N = 3, 4
    kp_uv = jnp.asarray(np.arange(F * N * 2, dtype=np.float32).reshape(F, N, 2))
    kp_valid = jnp.ones((F, N), bool)
    # frame0 kp i -> frame1 kp (i+1)%N -> frame2 kp (i+2)%N, one match broken
    idx01 = jnp.asarray([(i + 1) % N for i in range(N)], jnp.int32)
    idx12 = jnp.asarray([(i + 1) % N for i in range(N)], jnp.int32)
    ok01 = jnp.asarray([True, True, False, True])
    ok12 = jnp.ones(N, bool)
    tr = tracks.link_detections(
        kp_uv, kp_valid, jnp.stack([idx01, idx12]), jnp.stack([ok01, ok12])
    )
    assert bool(tr.alive[2, 0])
    assert not bool(tr.alive[1, 2])  # broken at the first link
    np.testing.assert_allclose(np.asarray(tr.uv[1, 0]), np.asarray(kp_uv[1, 1]))
    np.testing.assert_allclose(np.asarray(tr.uv[2, 0]), np.asarray(kp_uv[2, 2]))


def test_render_artifacts(tmp_path):
    gray = np.random.default_rng(0).uniform(0, 255, (100, 150)).astype(np.float32)
    uv = np.asarray([[20.0, 30.0], [100.0, 60.0]])
    valid = np.asarray([True, True])
    img = render.draw_features(gray, uv, valid, np.asarray([[2.0, 1.0], [-1.0, 0.5]]),
                               path=tmp_path / "feat.png")
    assert (tmp_path / "feat.png").exists()
    render.draw_objects(gray, [np.asarray([10, 10, 60, 50])], [1], [42.5],
                        path=tmp_path / "speed.png")
    poses = [np.eye(4) for _ in range(3)]
    for i, p in enumerate(poses):
        p[2, 3] = i * 1.0
    render.draw_trajectory(poses, path=tmp_path / "traj.png")
    render.draw_birdeye_flow(
        np.asarray([[0.0, 0.0, 10.0]]), np.asarray([[1.0, 0.0, 0.5]]),
        np.asarray([True]), path=tmp_path / "bird.png",
    )
    for f in ("speed.png", "traj.png", "bird.png"):
        assert (tmp_path / f).stat().st_size > 0
