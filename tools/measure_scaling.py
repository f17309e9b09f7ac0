"""Measure multi-chip scaling of the full pair-sharded tracker.

Runs pipeline/batch.track_pairs (the COMPLETE per-pair program: frontend
pairing, photometric gate, RANSAC, camera+object flow-BA, metrics) over
1/2/4/8-device meshes on the virtual CPU pool and records, per mesh size:

  * wall-clock time for a fixed B=8-pair batch (strong scaling) — median
    of --reps compiled executions;
  * XLA cost analysis of the partitioned module: per-device FLOPs and
    bytes accessed.  On a host with fewer cores than devices the wall
    clock saturates at the core count (the virtual devices share them),
    so the per-device FLOP ratio is the hardware-independent scaling
    signal: flops(1)/(n*flops(n)) is the fraction of the program XLA
    actually partitioned.

Usage:  python tools/measure_scaling.py [--full] [--reps 3] [--out SCALING.json]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
if "xla_cpu_max_isa" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_cpu_max_isa=AVX2"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _dryrun_cfg  # noqa: E402
from multimot_track_tpu.config import DEFAULT_CONFIG  # noqa: E402
from multimot_track_tpu.parallel import multihost  # noqa: E402
from multimot_track_tpu.pipeline import batch as B_  # noqa: E402
from multimot_track_tpu.pipeline import frames as F  # noqa: E402


def build_batch(cfg, n_pairs, rng):
    cam = cfg.camera
    K = cfg.padding.k_obj_max
    nb = n_pairs + 1
    H, W = cam.height, cam.width
    gray = rng.integers(0, 255, (nb, H, W)).astype(np.uint8)
    disp = rng.uniform(2000, 20000, (nb, H, W)).astype(np.uint16)
    flow = np.clip(rng.normal(0, 1.5, (nb, H, W, 2)) * 128.0, -32767, 32767).astype(np.int16)
    sem = np.zeros((nb, H, W), np.uint8)
    sem[:, H // 3: 2 * H // 3, W // 3: 2 * W // 3] = 1
    gts = [F.make_gt_table(np.eye(4), [1], [np.eye(4)], K) for _ in range(nb)]
    gt_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gts)
    obs = B_.frontend_batch(
        jnp.asarray(gray), jnp.asarray(disp), jnp.asarray(flow),
        jnp.asarray(sem), gt_stack, cfg,
    )
    prev = jax.tree_util.tree_map(lambda x: np.asarray(x)[:-1], obs)
    gt_cur = jax.tree_util.tree_map(lambda x: np.asarray(x)[1:], gt_stack)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(0), n_pairs))
    return (keys, prev, gray[1:], disp[1:], sem[1:], gt_cur)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="DEFAULT_CONFIG geometry (slow on CPU); default: dryrun config")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = DEFAULT_CONFIG if args.full else _dryrun_cfg()
    rng = np.random.default_rng(0)
    host_batch = build_batch(cfg, args.pairs, rng)
    devs = jax.devices()
    rows = []
    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        mesh = multihost.make_process_mesh(
            devices=devs[:n], emulate_hosts=2 if n >= 2 else 1
        )
        batch = multihost.global_pair_batch(mesh, host_batch)
        lowered = B_.track_pairs.lower(*batch, cfg)
        compiled = lowered.compile()
        ca = compiled.cost_analysis() or {}
        # warmup + timed reps
        out = compiled(*batch)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = compiled(*batch)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        rows.append(dict(
            n_devices=n,
            wall_s=round(t, 4),
            pairs_per_s=round(args.pairs / t, 3),
            flops_per_device=ca.get("flops"),
            bytes_per_device=ca.get("bytes accessed"),
        ))
        print(json.dumps(rows[-1]))

    base = rows[0]
    for r in rows:
        n = r["n_devices"]
        if base.get("flops_per_device") and r.get("flops_per_device"):
            r["flop_parallel_eff"] = round(
                base["flops_per_device"] / (n * r["flops_per_device"]), 4
            )
        r["wall_eff"] = round(r["pairs_per_s"] / (n * base["pairs_per_s"]), 4)
    print(json.dumps(rows, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(config="full" if args.full else "tiny",
                           n_cores=os.cpu_count(), rows=rows), f, indent=1)


if __name__ == "__main__":
    main()
