import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.frontend import sift
from multimot_track_tpu.ops import matching

RNG = np.random.default_rng(29)


def blobby_image(H=160, W=240, n=40, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W), np.float32)
    for _ in range(n):
        y, x = rng.integers(20, H - 20), rng.integers(20, W - 20)
        r = rng.integers(3, 9)
        yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
        blob = np.exp(-(yy**2 + xx**2) / (0.5 * r**2)) * rng.uniform(80, 200)
        img[y - r : y + r + 1, x - r : x + r + 1] += blob
    return np.clip(img, 0, 255)


def test_extract_shapes():
    img = jnp.asarray(blobby_image())
    kp = sift.extract_sift(img, n_octaves=3, n_max=256)
    assert kp.desc.shape == (256, 128)
    v = np.asarray(kp.valid)
    assert v.sum() > 20
    norms = np.linalg.norm(np.asarray(kp.desc)[v], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_blob_centers_detected():
    img = np.zeros((100, 100), np.float32)
    for (y, x) in [(30, 30), (30, 70), (70, 50)]:
        yy, xx = np.mgrid[-6:7, -6:7]
        img[y - 6 : y + 7, x - 6 : x + 7] += 200 * np.exp(-(yy**2 + xx**2) / 8.0)
    kp = sift.extract_sift(jnp.asarray(img), n_octaves=2, n_max=64)
    uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
    for (y, x) in [(30, 30), (30, 70), (70, 50)]:
        assert np.min(np.linalg.norm(uv - [x, y], axis=1)) < 3.0


def test_sift_matching_under_shift():
    base = blobby_image(seed=3)
    img0 = jnp.asarray(base)
    img1 = jnp.asarray(np.roll(base, 5, axis=1))
    k0 = sift.extract_sift(img0, n_octaves=3, n_max=128)
    k1 = sift.extract_sift(img1, n_octaves=3, n_max=128)
    res = matching.match_float(k0.desc, k1.desc, k0.valid, k1.valid)
    v = np.asarray(res.valid)
    assert v.sum() > 10
    # matched keypoints should be displaced by ~(+5, 0)
    duv = np.asarray(k1.uv)[np.asarray(res.idx)[v]] - np.asarray(k0.uv)[v]
    med = np.median(duv, axis=0)
    assert abs(med[0] - 5) < 1.5 and abs(med[1]) < 1.5, med
