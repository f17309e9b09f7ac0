import pytest
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


def test_refine_position_subpixel():
    """KLT re-centering recovers a known sub-pixel shift."""
    import numpy as np
    from multimot_track_tpu.ops import photometric

    rng = np.random.default_rng(5)
    H, W = 64, 96
    base = rng.uniform(0, 255, (H + 4, W + 4)).astype(np.float32)
    # smooth it so bilinear interpolation is meaningful
    k = np.asarray([0.25, 0.5, 0.25])
    for ax in (0, 1):
        base = np.apply_along_axis(lambda m: np.convolve(m, k, "same"), ax, base)
    img0 = jnp.asarray(base[2:H+2, 2:W+2])
    dx, dy = 1.3, -0.7
    # img1 = img0 shifted by (dx, dy): sample img0 at (x - dx, y - dy)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = jnp.asarray(np.stack([(xs - dx).ravel(), (ys - dy).ravel()], -1).astype(np.float32))
    img1 = photometric.extract_patches(img0, pos, 0).reshape(H, W)

    uv = jnp.asarray(rng.uniform([8, 8], [W - 8, H - 8], (50, 2)).astype(np.float32))
    p0 = photometric.extract_patches(img0, uv, 2)
    # prediction = true position + noise within the search radius
    pred = uv + jnp.asarray([dx, dy]) + jnp.asarray(rng.uniform(-1, 1, (50, 2)).astype(np.float32))
    ref, sc = photometric.refine_position(img1, pred, p0, 2, search_radius=2)
    err = np.linalg.norm(np.asarray(ref) - (np.asarray(uv) + [dx, dy]), axis=1)
    assert float(np.median(err)) < 0.35, float(np.median(err))
    assert float(np.median(np.asarray(sc))) > 0.9


@pytest.mark.slow
def test_chain_tracks_zncc_survival(kitti_sample_dir):
    """Template-update KLT chaining survives >2x longer than the plain
    flow chain + cumulative frame-0 gate on real frames."""
    import numpy as np
    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.frontend import fast, tracks
    from multimot_track_tpu.geometry import camera
    from multimot_track_tpu.io.kitti import KittiSequence
    from multimot_track_tpu.ops import photometric

    cfg = DEFAULT_CONFIG
    seq = KittiSequence(kitti_sample_dir)
    fds = [seq.load_frame(i) for i in range(5)]
    grays = jnp.stack([jnp.asarray(f.gray, jnp.float32) for f in fds])
    flows = jnp.stack([jnp.asarray(f.flow, jnp.float32) for f in fds[:-1]])
    sems = jnp.stack([jnp.asarray(f.sem_mask.astype(np.int32)) for f in fds])
    depth0 = camera.disparity_png_to_depth(
        jnp.asarray(fds[0].depth_raw.astype(np.float32)), cfg.camera.bf
    )
    kp = fast.detect_pyramid(grays[0], n_levels=4, n_total=2048)
    z0, _ = camera.nearest_sample(depth0, kp.uv)
    lab0, _ = camera.nearest_sample(sems[0], kp.uv)
    v0 = kp.valid & (z0 > 0) & (z0 < 40.0) & (lab0 == 0)

    r = cfg.solver.zncc_patch_radius
    gate = cfg.backend.window_zncc_min
    tr = tracks.chain_tracks(kp.uv, v0, flows, sems)
    p0 = photometric.extract_patches(grays[0], kp.uv, r)
    a = np.asarray(tr.alive[0])
    for f in range(1, 5):
        pf = photometric.extract_patches(grays[f], tr.uv[f], r)
        a = a & np.asarray(tr.alive[f]) & (np.asarray(photometric.zncc(p0, pf)) > gate)
    n_plain = int(a.sum())

    tr2 = tracks.chain_tracks_zncc(
        kp.uv, v0, flows, grays, sems, patch_radius=r, zncc_min=gate
    )
    n_klt = int(np.asarray(tr2.alive[4]).sum())
    assert n_klt > 2 * n_plain, (n_klt, n_plain)
