"""Dissect the 1.37s fetch: per-execution latency vs input re-staging."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.native_loader import get_sequence
from multimot_track_tpu.pipeline import batch as B
from multimot_track_tpu.pipeline import frames as F


def main():
    cfg = DEFAULT_CONFIG
    K = cfg.padding.k_obj_max
    seq = get_sequence("/root/reference/kitti_sample")
    frames = [seq.load_frame(i) for i in range(len(seq))]
    Fn = len(frames)

    grays = np.stack([np.clip(np.round(fd.gray), 0, 255).astype(np.uint8) for fd in frames])
    depths = np.stack([np.clip(fd.depth_raw, 0, 65535).astype(np.uint16) for fd in frames])
    flows = np.stack([np.clip(fd.flow * 128.0, -32767, 32767).astype(np.int16) for fd in frames])
    sems = np.stack([np.clip(fd.sem_mask, 0, 255).astype(np.uint8) for fd in frames])
    gts = [F.make_gt_table(fd.pose_gt, fd.obj_ids_gt, fd.obj_poses_gt, K) for fd in frames]
    gt_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gts)

    gray_d = jnp.asarray(grays); depth_d = jnp.asarray(depths)
    flow_d = jnp.asarray(flows); sem_d = jnp.asarray(sems)

    # warm-up compiles
    obs = B.frontend_batch(gray_d, depth_d, flow_d, sem_d, gt_stack, cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), Fn - 1)
    packed = B.track_batch_packed(keys, obs, gray_d, depth_d, sem_d, gt_stack, cfg)
    np.asarray(packed)

    # (a) frontend alone: dispatch + fetch one small leaf
    for r in range(3):
        g2 = jnp.asarray(np.where(grays == r, grays, grays))  # fresh buffer
        t0 = time.perf_counter()
        o = B.frontend_batch(g2, depth_d, flow_d, sem_d, gt_stack, cfg)
        t1 = time.perf_counter()
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf[..., :1])
        t2 = time.perf_counter()
        print(f"(a) frontend: dispatch {t1-t0:.3f}s  fetch-small-leaf {t2-t1:.3f}s")

    # (b) track with fully resident inputs, repeated with distinct keys
    for r in range(4):
        k2 = jax.random.split(jax.random.PRNGKey(10 + r), Fn - 1)
        t0 = time.perf_counter()
        p = B.track_batch_packed(k2, obs, gray_d, depth_d, sem_d, gt_stack, cfg)
        t1 = time.perf_counter()
        np.asarray(p)
        t2 = time.perf_counter()
        print(f"(b) track resident: dispatch {t1-t0:.3f}s  fetch {t2-t1:.3f}s")

    # (c) two back-to-back tracks, then fetch both
    k3 = jax.random.split(jax.random.PRNGKey(50), Fn - 1)
    k4 = jax.random.split(jax.random.PRNGKey(51), Fn - 1)
    t0 = time.perf_counter()
    p1 = B.track_batch_packed(k3, obs, gray_d, depth_d, sem_d, gt_stack, cfg)
    p2 = B.track_batch_packed(k4, obs, gray_d, depth_d, sem_d, gt_stack, cfg)
    t1 = time.perf_counter()
    np.asarray(p1); np.asarray(p2)
    t2 = time.perf_counter()
    print(f"(c) two tracks: dispatch {t1-t0:.3f}s  fetch-both {t2-t1:.3f}s")


if __name__ == "__main__":
    main()
