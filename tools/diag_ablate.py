"""Per-stage device-time ablation of the full tracker program.

Slope-times `pipeline/batch.track_batch_packed` (the streaming-path
program: pairing + solves + segmentation + metrics, ONE packed f32
output so every stage stays live — no dead-code elimination, see
PERF.md methodology) under config knockouts, on the real TPU.  The
difference between a variant and the default attributes device time to
the knocked-out stage.

This is the tool that located the round-2 hotspots: ensemble consensus
patch scoring (~105 ms/pair) and RANSAC hypothesis scoring
(~10 ms/stream) before witness subsampling (PERF.md "Where the
144 ms/pair went").

Usage: timeout 3600 python tools/diag_ablate.py   (background it: each
       variant costs 2 remote compiles, ~8-10 min)
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.native_loader import get_sequence
from multimot_track_tpu.pipeline import batch as B_
from multimot_track_tpu.pipeline import frames as F


def load_inputs(cfg, n_frames=5):
    seq = get_sequence("/root/reference/kitti_sample")
    sub = [seq.load_frame(i) for i in range(n_frames)]
    K = cfg.padding.k_obj_max
    gray = jnp.asarray(np.stack(
        [np.clip(np.round(f.gray), 0, 255).astype(np.uint8) for f in sub]))
    depth = jnp.asarray(np.stack(
        [np.clip(f.depth_raw, 0, 65535).astype(np.uint16) for f in sub]))
    flow = jnp.asarray(np.stack([B_.pack_flow12(f.flow) for f in sub]))
    sem = jnp.asarray(np.stack([B_.pack_sem4(f.sem_mask) for f in sub]))
    gts = [F.make_gt_table(f.pose_gt, f.obj_ids_gt, f.obj_poses_gt, K)
           for f in sub]
    gt_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gts)
    return gray, depth, flow, sem, gt_stack


def measure(cfg, inputs, reps_lo=8, reps_hi=40):
    """Seconds per 4-pair batch: slope between two scanned rep counts
    (cancels the tunnel's constant round-trip term; carry-perturbed
    inputs defeat execution dedup)."""
    gray, depth, flow, sem, gt_stack = inputs
    obs = B_.frontend_batch(gray, depth, flow, sem, gt_stack, cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), gray.shape[0] - 1)

    def make(reps):
        def prog(tok0):
            def body(tok, i):
                out = B_.track_batch_packed(
                    keys + (tok + i).astype(keys.dtype), obs, gray, depth,
                    sem, gt_stack, cfg)
                acc = jnp.sum(out)
                return tok + 1 + (acc.astype(jnp.int32) & 1), acc

            _, accs = jax.lax.scan(body, tok0,
                                   jnp.arange(reps, dtype=jnp.int32))
            return accs

        c = jax.jit(prog).lower(jnp.int32(0)).compile()
        np.asarray(c(jnp.int32(0)))  # warmup with value fetch
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            np.asarray(c(jnp.int32(1000 * (r + 1) + reps)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (make(reps_hi) - make(reps_lo)) / (reps_hi - reps_lo)


def main():
    cfg0 = DEFAULT_CONFIG
    inputs = load_inputs(cfg0)

    def repl(**kw):
        return dataclasses.replace(
            cfg0, solver=dataclasses.replace(cfg0.solver, **kw))

    variants = {
        "default": cfg0,
        # stage knockouts: delta vs default = the stage's device cost
        "ensemble_off": repl(obj_ensemble=False),
        "reclassify_0": repl(obj_reclassify_rounds=0),
        "obj_lm_50": repl(obj_lm_iters=50),
        "ego_ransac_125": repl(ransac_iters=125),
        # witness-subsampling OFF reproduces the pre-fix cost
        # "no_subsample": repl(obj_ransac_score_pts=0, obj_consensus_pts=0),
    }
    n_pairs = inputs[0].shape[0] - 1
    for name, c in variants.items():
        t = measure(c, inputs)
        print(f"{name:16}: {t*1e3:7.1f} ms/{n_pairs}-pair batch = "
              f"{t/n_pairs*1e3:6.1f} ms/pair", flush=True)


if __name__ == "__main__":
    main()
