"""Single-chip performance characterization (BASELINE.md "speed-of-light").

Quantifies, on the real TPU:

  1. device-resident throughput of the full per-pair tracker program
     (pipeline/batch.track_pairs): slope-timed lax.scan with every output
     leaf live (see timed_scan) so neither tunnel latency nor XLA dead-code
     elimination can distort the number;
  2. XLA cost analysis of that compiled program: FLOPs and HBM bytes per
     pair, achieved GFLOP/s and GB/s against TPU v5e peaks
     (197 TFLOP/s bf16 MXU, 819 GB/s HBM) — this pipeline is a
     geometry/solver workload (thousands of 6x6 Schur systems, small
     matmuls), so HBM utilisation is the meaningful axis;
  3. the two hot kernels in isolation: flow-BA (2048 pts, full LM) and
     the MXU Hamming matcher (4000x4000x256bit);
  4. a >=50-frame end-to-end bench (kitti_sample tiled to 57 frames) with
     a max_pairs_per_call sweep — the tunnel-inclusive serving number.

Writes PERF.json; PERF.md narrates the results.
Usage: timeout 3500 python tools/perf_characterize.py  (run in background:
       every previously-uncompiled program costs ~4-5 min of remote compile)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def timed_queue(compiled_call, args, reps=20):
    """Queue `reps` async executions, block once; returns seconds/execution.

    NOTE: identical repeated executions can be deduplicated by the remote
    runtime — use :func:`timed_scan` for trustworthy device numbers."""
    out = compiled_call(*args)
    jax.block_until_ready(out)       # warmup / ensure compiled
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled_call(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def timed_scan(fn_one, args, reps=8, outer=3, reps_hi=None):
    """Device-only timing: `reps` iterations of fn_one inside ONE compiled
    lax.scan program, each iteration's inputs perturbed by the carry so no
    execution can be cached/deduped.  fn_one(i, args) -> array.

    Two tunnel artifacts are defended against (both observed):
      * identical (program, inputs) executions are deduplicated -> every
        timed call uses a distinct tok0 and the scan carries a genuine
        data-dependence chain;
      * `jax.block_until_ready` on the remote arrays sometimes returns
        without a round trip -> every timed call fetches the scan's
        result values (np.asarray), and the per-iteration time is the
        SLOPE between a low and a high rep count, which cancels the
        constant round-trip/transfer term exactly.

    Returns (sec_per_iter, cost_analysis_of_single_iteration_program).
    """
    import jax.numpy as jnp

    if reps_hi is None:
        reps_hi = 5 * reps

    def make(nreps):
        def prog(tok0, args):
            def body(tok, i):
                out = fn_one(tok + i, args)
                # sum EVERY leaf (ints/bools included): any output left out
                # of the carry is dead code the compiler deletes, and the
                # "measurement" silently covers only the surviving slice —
                # this exact bug once reported the ego-only slice (1.1 ms)
                # as the full tracker (then ~144 ms)
                acc = sum(jnp.sum(x.astype(jnp.float32))
                          for x in jax.tree_util.tree_leaves(out))
                return tok + 1 + (acc.astype(jnp.int32) & 1), acc

            _, accs = jax.lax.scan(body, tok0, jnp.arange(nreps, dtype=jnp.int32))
            return accs

        compiled = jax.jit(prog).lower(jnp.int32(0), args).compile()
        np.asarray(compiled(jnp.int32(0), args))   # warmup with value fetch
        ts = []
        for r in range(outer):
            t0 = time.perf_counter()
            np.asarray(compiled(jnp.int32(1000 * (r + 1) + nreps), args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), compiled.cost_analysis() or {}

    t_lo, ca = make(reps)
    t_hi, _ = make(reps_hi)
    sec = max(t_hi - t_lo, 1e-9) / (reps_hi - reps)
    # scale the scanned program's cost analysis down to one iteration
    ca1 = {k: v / reps for k, v in ca.items() if isinstance(v, (int, float))}
    return sec, ca1


def characterize_track_pairs(frames, cfg, n_pairs=4):
    from multimot_track_tpu.pipeline import batch as B_
    from multimot_track_tpu.pipeline import frames as F

    K = cfg.padding.k_obj_max
    sub = frames[: n_pairs + 1]
    gray = jnp.asarray(np.stack([np.clip(np.round(f.gray), 0, 255).astype(np.uint8) for f in sub]))
    depth = jnp.asarray(np.stack([np.clip(f.depth_raw, 0, 65535).astype(np.uint16) for f in sub]))
    flow = jnp.asarray(np.stack([np.clip(f.flow * 128.0, -32767, 32767).astype(np.int16) for f in sub]))
    sem = jnp.asarray(np.stack([np.clip(f.sem_mask, 0, 255).astype(np.uint8) for f in sub]))
    gts = [F.make_gt_table(f.pose_gt, f.obj_ids_gt, f.obj_poses_gt, K) for f in sub]
    gt_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gts)
    obs = B_.frontend_batch(gray, depth, flow, sem, gt_stack, cfg)
    prev = jax.tree_util.tree_map(lambda x: x[:-1], obs)
    gt_cur = jax.tree_util.tree_map(lambda x: x[1:], gt_stack)
    keys = jax.random.split(jax.random.PRNGKey(0), n_pairs)
    args = (keys, prev, gray[1:], depth[1:], sem[1:], gt_cur)

    # FLOP/byte accounting from the pure-XLA lowering: the Pallas kernel
    # reports only its declared CostEstimate (a worst-case bound), which
    # would inflate the numbers
    import dataclasses

    cfg_xla = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, flow_ba_backend="xla")
    )
    ca = B_.track_pairs.lower(*args, cfg_xla).compile().cost_analysis() or {}

    def fn_one(tok, a):
        # return the FULL PairResult: timed_scan keeps every leaf live, so
        # nothing (object ensemble, consensus, segmentation, metrics) is
        # dead-code-eliminated out of the timed program
        keys_, prev_, g_, d_, s_, gt_ = a
        return B_.track_pairs(
            keys_ + tok.astype(keys_.dtype), prev_, g_, d_, s_, gt_, cfg
        )

    sec, _ = timed_scan(fn_one, args, reps=8)
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return dict(
        program="track_pairs (full tracker)",
        flow_ba_backend=cfg.solver.flow_ba_backend,
        batch_pairs=n_pairs,
        device_ms_per_batch=round(sec * 1e3, 3),
        device_ms_per_pair=round(sec * 1e3 / n_pairs, 3),
        device_pairs_per_s=round(n_pairs / sec, 1),
        flops_per_pair=flops / n_pairs,
        hbm_bytes_per_pair=byts / n_pairs,
        achieved_gflops=round(flops / sec / 1e9, 2),
        achieved_gbps=round(byts / sec / 1e9, 2),
        mfu_vs_bf16_peak=round(flops / sec / PEAK_BF16_FLOPS, 5),
        hbm_util=round(byts / sec / PEAK_HBM_BPS, 4),
    )


def characterize_frontend(frames, cfg, n_frames=5):
    from multimot_track_tpu.pipeline import batch as B_
    from multimot_track_tpu.pipeline import frames as F

    K = cfg.padding.k_obj_max
    sub = frames[:n_frames]
    gray = jnp.asarray(np.stack([np.clip(np.round(f.gray), 0, 255).astype(np.uint8) for f in sub]))
    depth = jnp.asarray(np.stack([np.clip(f.depth_raw, 0, 65535).astype(np.uint16) for f in sub]))
    flow = jnp.asarray(np.stack([np.clip(f.flow * 128.0, -32767, 32767).astype(np.int16) for f in sub]))
    sem = jnp.asarray(np.stack([np.clip(f.sem_mask, 0, 255).astype(np.uint8) for f in sub]))
    gts = [F.make_gt_table(f.pose_gt, f.obj_ids_gt, f.obj_poses_gt, K) for f in sub]
    gt_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gts)

    def fn_one(tok, g):
        return B_.frontend_batch(g + tok.astype(jnp.uint8), depth, flow, sem, gt_stack, cfg)

    sec, _ = timed_scan(fn_one, gray, reps=8)
    return dict(
        program="frontend_batch (FAST pyramid + sampling + patches)",
        n_frames=n_frames,
        device_ms_per_frame=round(sec * 1e3 / n_frames, 3),
    )


def characterize_flow_ba(cfg):
    from multimot_track_tpu.solvers.flow_ba import (
        FlowBAParams, solve_flow_ba, solve_flow_ba_auto)

    cam = cfg.camera
    rng = np.random.default_rng(0)
    N = cfg.padding.n_static_max
    # realistic problem (a pure-noise flow converges in 2-3 LM iterations
    # and under-reports the per-iteration cost): true rigid motion, noisy
    # flow, 10% gross outliers — the solver runs its full convergence arc
    from multimot_track_tpu.geometry import camera as _camgeo, se3 as _se3

    uv = jnp.asarray(rng.uniform([100, 50], [cam.width - 100, cam.height - 50], (N, 2)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(5, 30, (N,)).astype(np.float32))
    xi = np.array([0.004, -0.01, 0.002, 0.3, -0.05, 1.1], np.float32)
    T_true = _se3.exp_se3(jnp.asarray(xi))
    Xw = _camgeo.backproject(uv, depth, cam.fx, cam.fy, cam.cx, cam.cy)
    uv_cur = _camgeo.project(_se3.transform(T_true, Xw), cam.fx, cam.fy, cam.cx, cam.cy)
    flow_np = np.asarray(uv_cur - uv) + rng.normal(0, 0.05, (N, 2)).astype(np.float32)
    n_out = N // 10
    flow_np[:n_out] += rng.normal(0, 20.0, (n_out, 2))
    flow = jnp.asarray(flow_np.astype(np.float32))
    valid = jnp.ones(N, bool)
    params = FlowBAParams(iters=cfg.solver.cam_lm_iters)
    eye = jnp.eye(4)
    args = (uv, flow, depth, valid)

    ca = jax.jit(lambda u, f_, d, v: solve_flow_ba(
        eye, eye, u, f_, d, v, cam.fx, cam.fy, cam.cx, cam.cy, params=params
    )).lower(*args).compile().cost_analysis() or {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    out = {}
    for backend in ("xla", "pallas"):
        # batch of 2 via vmap: the Pallas kernel has a known single-
        # instance-inside-scan miscompile on this toolchain (see
        # solvers/flow_ba_pallas.py erratum); B=2 is a verified form and
        # per-solve time = batch time / 2 for both backends
        def fn_one(tok, a, _b=backend):
            uv_, flow_, depth_, valid_ = a
            f2 = jnp.stack([flow_ + tok.astype(jnp.float32) * 1e-6,
                            flow_ + tok.astype(jnp.float32) * 2e-6])
            return jax.vmap(
                lambda f: solve_flow_ba_auto(
                    eye, eye, uv_, f, depth_, valid_,
                    cam.fx, cam.fy, cam.cx, cam.cy, params=params, backend=_b,
                ).T
            )(f2)

        # small program: needs a wide rep separation for the slope to rise
        # above the tunnel's RTT jitter
        sec2, _ = timed_scan(fn_one, args, reps=64, reps_hi=512)
        sec = sec2 / 2.0
        out[backend] = dict(
            device_ms=round(sec * 1e3, 3),
            achieved_gflops=round(flops / sec / 1e9, 2),
            achieved_gbps=round(byts / sec / 1e9, 2),
            hbm_util=round(byts / sec / PEAK_HBM_BPS, 4),
        )
    out["program"] = f"flow_ba N={N} iters={params.iters} (B=2 vmap / 2)"
    return out


def characterize_matcher():
    from multimot_track_tpu.ops.matching import match_descriptors

    rng = np.random.default_rng(0)
    N = 4096
    da = jnp.asarray(rng.integers(0, 256, (N, 32)).astype(np.uint8))
    db = jnp.asarray(rng.integers(0, 256, (N, 32)).astype(np.uint8))
    va = jnp.ones(N, bool)
    args = (da, db, va, va)
    compiled = match_descriptors.lower(*args).compile()
    ca = compiled.cost_analysis() or {}

    def fn_one(tok, a):
        da_, db_, va_, vb_ = a
        return match_descriptors(
            (da_.astype(jnp.int32) + tok % 2).astype(jnp.uint8), db_, va_, vb_
        ).dist

    sec, _ = timed_scan(fn_one, args, reps=8)
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return dict(
        program=f"match_descriptors {N}x{N}x256bit",
        device_ms=round(sec * 1e3, 3),
        achieved_gflops=round(flops / sec / 1e9, 2),
        mfu_vs_bf16_peak=round(flops / sec / PEAK_BF16_FLOPS, 5),
        achieved_gbps=round(byts / sec / 1e9, 2),
        hbm_util=round(byts / sec / PEAK_HBM_BPS, 4),
    )


def long_bench(frames, cfg, n_frames=57, chunks=(4, 8, 16)):
    from multimot_track_tpu.pipeline.batch import run_sequence_batched

    tiled = [frames[i % len(frames)] for i in range(n_frames)]
    rows = []
    for c in chunks:
        run_sequence_batched(tiled, cfg, max_pairs_per_call=c)  # compile
        durs = []
        for r in range(3):
            t0 = time.perf_counter()
            run_sequence_batched(tiled, cfg, seed=r, max_pairs_per_call=c)
            durs.append(time.perf_counter() - t0)
        med = sorted(durs)[1]
        rows.append(dict(
            n_frames=n_frames, max_pairs_per_call=c,
            wall_s=round(med, 2), fps_end_to_end=round((n_frames - 1) / med, 2),
        ))
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-long", action="store_true", help="skip the 57-frame sweep")
    cli = ap.parse_args()

    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.io.native_loader import get_sequence

    print("devices:", jax.devices(), flush=True)
    seq = get_sequence("/root/reference/kitti_sample")
    frames = [seq.load_frame(i) for i in range(len(seq))]
    cfg = DEFAULT_CONFIG

    out = {"device": str(jax.devices()[0])}
    out["track_pairs"] = characterize_track_pairs(frames, cfg)
    print(json.dumps(out["track_pairs"]), flush=True)
    out["frontend"] = characterize_frontend(frames, cfg)
    print(json.dumps(out["frontend"]), flush=True)
    out["flow_ba"] = characterize_flow_ba(cfg)
    print(json.dumps(out["flow_ba"]), flush=True)
    out["matcher"] = characterize_matcher()
    print(json.dumps(out["matcher"]), flush=True)
    if cli.no_long:
        try:
            with open("PERF.json") as f:
                out["long_bench"] = __import__("json").load(f).get("long_bench")
        except Exception:
            pass
    else:
        out["long_bench"] = long_bench(frames, cfg)

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PERF.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote PERF.json", flush=True)


if __name__ == "__main__":
    main()
