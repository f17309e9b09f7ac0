"""Quantify the tunnel split for the batched serving path.

Times, separately and honestly (distinct data per rep so the tunnel
runtime's execution-dedup cannot fake any number):
  1. host->device upload of one bench input set (gray/depth/flow/sem),
  2. the frontend_batch program on device-resident inputs,
  3. the track_batch_packed program on device-resident inputs,
  4. device->host download of the packed result vector.

Run: timeout 580 python tools/diag_tunnel.py
"""

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
from multimot_track_tpu.pipeline import tracker


def sync(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        leaf.block_until_ready()


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
    sync(gt_stack)

    nbytes = grays.nbytes + depths.nbytes + flows.nbytes + sems.nbytes
    print(f"input bytes/rep: {nbytes/1e6:.2f} MB "
          f"(gray {grays.nbytes/1e6:.2f}, depth {depths.nbytes/1e6:.2f}, "
          f"flow {flows.nbytes/1e6:.2f}, sem {sems.nbytes/1e6:.2f})")

    # ---- 1. upload: vary one byte each rep so no caching can hide it ----
    reps = 6
    ts = []
    for r in range(reps):
        g = grays.copy(); g[0, 0, 0] = r
        d = depths.copy(); d[0, 0, 0] = r
        fl = flows.copy(); fl[0, 0, 0, 0] = r
        s = sems.copy(); s[0, 0, 0] = r
        t0 = time.perf_counter()
        dev = (jnp.asarray(g), jnp.asarray(d), jnp.asarray(fl), jnp.asarray(s))
        sync(dev)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    up = ts[len(ts) // 2]
    print(f"upload: median {up*1e3:.0f} ms -> {nbytes/up/1e6:.1f} MB/s")

    gray_d, depth_d, flow_d, sem_d = dev

    # ---- 2. frontend on resident inputs ----
    obs = B.frontend_batch(gray_d, depth_d, flow_d, sem_d, gt_stack, cfg)
    sync(obs)
    ts = []
    for r in range(reps):
        g2 = gray_d.at[0, 0, 0].set(r)  # distinct input each rep
        t0 = time.perf_counter()
        o = B.frontend_batch(g2, depth_d, flow_d, sem_d, gt_stack, cfg)
        sync(o)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"frontend_batch: median {ts[len(ts)//2]*1e3:.0f} ms")

    # ---- 3. track on resident inputs ----
    keys = jax.random.split(jax.random.PRNGKey(0), Fn - 1)
    packed = B.track_batch_packed(keys, obs, gray_d, depth_d, sem_d, gt_stack, cfg)
    packed.block_until_ready()
    ts = []
    for r in range(reps):
        k2 = jax.random.split(jax.random.PRNGKey(r + 1), Fn - 1)
        t0 = time.perf_counter()
        p = B.track_batch_packed(k2, obs, gray_d, depth_d, sem_d, gt_stack, cfg)
        p.block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"track_batch_packed: median {ts[len(ts)//2]*1e3:.0f} ms "
          f"(result {packed.nbytes/1e3:.1f} kB)")

    # ---- 4. download ----
    ts = []
    for r in range(reps):
        k2 = jax.random.split(jax.random.PRNGKey(100 + r), Fn - 1)
        p = B.track_batch_packed(k2, obs, gray_d, depth_d, sem_d, gt_stack, cfg)
        p.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(p)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"download packed: median {ts[len(ts)//2]*1e3:.0f} ms")

    # ---- 5. dispatch latency: trivial program, distinct scalar ----
    f = jax.jit(lambda x: x + 1.0)
    _ = f(jnp.float32(0.0)).block_until_ready()
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        f(jnp.float32(r)).block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"null dispatch: median {ts[len(ts)//2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
