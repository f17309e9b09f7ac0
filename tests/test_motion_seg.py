"""Mask-free object discovery on a synthetic RGB-D pair."""

import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.pipeline import motion_seg

CAM = CameraConfig()


def synth_pair(H=192, W=512):
    """Static plane at z=15 with a moving box region at z=10."""
    depth0 = np.full((H, W), 15.0, np.float32)
    box = (slice(60, 140), slice(200, 320))
    depth0[box] = 10.0
    ego = np.asarray(se3.exp_se3(jnp.asarray([0.0, 0.002, 0.0, 0.05, 0.0, 0.8], jnp.float32)))
    H_obj = np.asarray(se3.exp_se3(jnp.asarray([0.0, 0.0, 0.0, 1.2, 0.0, 0.3], jnp.float32)))

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    uv = np.stack([xs, ys], -1).reshape(-1, 2)
    d = depth0.reshape(-1)
    X0 = np.asarray(camera.backproject(jnp.asarray(uv), jnp.asarray(d), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    in_box = np.zeros((H, W), bool)
    in_box[box] = True
    motion = np.where(in_box.reshape(-1, 1, 1),
                      (ego @ H_obj)[None], ego[None])  # object: ego after obj move
    X1 = np.einsum("nij,nj->ni", motion[:, :3, :3], X0) + motion[:, :3, 3]
    uv1 = np.asarray(camera.project(jnp.asarray(X1), CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    flow = (uv1 - uv).reshape(H, W, 2).astype(np.float32)
    # frame-1 depth by forward-warping every pixel's moved z (the whole
    # scene changes depth under the ego motion, not just the box)
    z1 = X1[:, 2]
    depth1 = np.full((H, W), np.median(z1), np.float32)
    xi = np.clip(np.round(uv1[:, 0]).astype(int), 0, W - 1)
    yi = np.clip(np.round(uv1[:, 1]).astype(int), 0, H - 1)
    depth1[yi, xi] = z1
    return depth0, depth1, flow, ego.astype(np.float32), in_box


def test_discovers_moving_object():
    depth0, depth1, flow, ego, in_box = synth_pair()
    disc = motion_seg.discover_objects(
        jax.random.PRNGKey(0),
        jnp.asarray(depth0), jnp.asarray(depth1), jnp.asarray(flow),
        jnp.asarray(ego), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
        step=8, n_max=512,
    )
    v = np.asarray(disc.valid)
    labs = np.asarray(disc.labels)[v]
    uvs = np.asarray(disc.uv)[v]
    assert v.sum() > 50  # the moving box produced dynamic candidates
    # candidate points should lie in the true box region
    inside = (uvs[:, 0] >= 195) & (uvs[:, 0] <= 325) & (uvs[:, 1] >= 55) & (uvs[:, 1] <= 145)
    assert inside.mean() > 0.9, inside.mean()
    # and they should agree on one non-ego label
    nonzero = labs[labs > 0]
    assert len(nonzero) > 0.7 * len(labs)
    dom = np.bincount(nonzero).argmax()
    assert (nonzero == dom).mean() > 0.8


def test_rasterize():
    depth0, depth1, flow, ego, in_box = synth_pair()
    disc = motion_seg.discover_objects(
        jax.random.PRNGKey(0),
        jnp.asarray(depth0), jnp.asarray(depth1), jnp.asarray(flow),
        jnp.asarray(ego), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
        step=8, n_max=512,
    )
    mask = np.asarray(motion_seg.rasterize_labels(disc, 192, 512, step=8))
    assert mask.shape == (192, 512)
    assert (mask > 0).sum() > 100
    # painted labels overlap the true box
    overlap = (mask > 0) & in_box
    assert overlap.sum() > 0.5 * (mask > 0).sum()


def test_discover_objects_exact_matches_relaxation():
    """The exact-labeler discovery (native alpha-expansion) must find the
    same moving-box structure as the jitted relaxation, at an energy no
    more than a hair apart (both solve the identical problem tensors)."""
    depth0, depth1, flow, ego, in_box = synth_pair()
    args = (
        jax.random.PRNGKey(0),
        jnp.asarray(depth0), jnp.asarray(depth1), jnp.asarray(flow),
        jnp.asarray(ego), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    kw = dict(step=8, n_max=512)
    d_mf = motion_seg.discover_objects(*args, **kw)
    d_ex = motion_seg.discover_objects_exact(*args, **kw)
    v = np.asarray(d_ex.valid)
    labs = np.asarray(d_ex.labels)[v]
    uvs = np.asarray(d_ex.uv)[v]
    inside = (uvs[:, 0] >= 195) & (uvs[:, 0] <= 325) & (uvs[:, 1] >= 55) & (uvs[:, 1] <= 145)
    assert inside.mean() > 0.9, inside.mean()
    assert (labs > 0).mean() > 0.7
    e_mf, e_ex = float(d_mf.energy), float(d_ex.energy)
    assert e_mf <= e_ex * 1.05 and e_ex <= e_mf * 1.05, (e_mf, e_ex)
