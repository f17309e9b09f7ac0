import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.frontend import optical_flow

RNG = np.random.default_rng(41)


def smooth_noise(H, W, blur=4):
    img = RNG.uniform(0, 255, (H, W)).astype(np.float32)
    k = np.ones(blur) / blur
    for ax in (0, 1):
        img = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), ax, img)
    return img.astype(np.float32)


def test_uniform_translation():
    img0 = smooth_noise(128, 192)
    shift = 3
    img1 = np.roll(img0, (0, shift), (0, 1))
    fl = np.asarray(optical_flow.dense_flow(jnp.asarray(img0), jnp.asarray(img1)))
    inner = fl[20:-20, 20:-20]
    assert abs(np.median(inner[..., 0]) - shift) < 0.3
    assert abs(np.median(inner[..., 1])) < 0.3


def test_two_region_flow():
    # NOTE smoothed white noise has no coarse-scale structure, the worst
    # case for pyramidal LK; use fewer levels like a matched window would
    img0 = smooth_noise(128, 256)
    img1 = np.empty_like(img0)
    img1[:, :128] = np.roll(img0, (2, 0), (0, 1))[:, :128]
    img1[:, 128:] = np.roll(img0, (0, 5), (0, 1))[:, 128:]
    fl = np.asarray(optical_flow.dense_flow(jnp.asarray(img0), jnp.asarray(img1), n_levels=4))
    left = fl[30:-30, 30:100]
    right = fl[30:-30, 160:-30]
    assert abs(np.median(left[..., 1]) - 2) < 0.75
    assert abs(np.median(right[..., 0]) - 5) < 0.75


def test_flow_on_real_frames(kitti_sample_dir):
    """Gold test: estimated flow vs the dataset's reference .flo."""
    from multimot_track_tpu.io.kitti import KittiSequence

    seq = KittiSequence(kitti_sample_dir)
    f0 = seq.load_frame(0)
    f1 = seq.load_frame(1)
    g0 = jnp.asarray(f0.gray[::2, ::2])
    g1 = jnp.asarray(f1.gray[::2, ::2])
    fl = np.asarray(optical_flow.dense_flow(g0, g1, n_levels=4))
    ref = f0.flow[::2, ::2]
    err = np.linalg.norm(fl - ref, axis=-1)
    inner = err[30:-30, 30:-30]
    # KITTI forward motion produces flows up to ~60 px at this resolution;
    # pyramidal LK is a *fallback* estimator (the .flo path is preferred),
    # so the gate is agreement on the bulk of the image, not parity with
    # the learned-flow reference
    assert np.median(inner) < 8.0, np.median(inner)
    assert np.percentile(inner, 25) < 3.5, np.percentile(inner, 25)


def test_subpixel_accuracy():
    # pure sinusoid allows exact subpixel shift synthesis
    H, W = 96, 128
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    def img(dx):
        return (np.sin((xs - dx) * 0.3) + np.cos(ys * 0.4)).astype(np.float32) * 50
    img0, img1 = img(0.0), img(1.5)
    fl = np.asarray(optical_flow.dense_flow(jnp.asarray(img0), jnp.asarray(img1), n_levels=3))
    inner = fl[20:-20, 20:-20, 0]
    assert abs(np.median(inner) - 1.5) < 0.2
