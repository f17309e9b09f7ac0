"""Benchmark: end-to-end multi-motion tracking frames/s on one chip.

Measures the TPU-native *batched streaming* mode: every repetition is an
independent request (its own image upload, its own RNG seed perturbing
the solve) dispatched asynchronously — requests overlap exactly as a
production serving pipeline overlaps them — and all packed results are
fetched at the end.  Throughput = total frames / wall time.  The
sequential per-request mode (upload -> solve -> fetch, one blocking sync
per request) is reported alongside for the latency-oriented reader.

Prints ONE JSON line:
  {"metric": "kitti_sample_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N / REF_FPS, ...}

Baseline: the reference publishes no numbers, so we built and ran it on
this machine (tools/build_reference.sh, PARITY.md): steady-state tracking
takes 0.179-0.401 s/frame => 4.2 frames/s.  vs_baseline is the speed-up
over that measured reference throughput.

NOTE the tunnel: this environment attaches the chip through a link whose
bandwidth and sync latency vary by the hour (measured 15-35 MB/s upload,
0.05-0.6 s per blocking sync).  Device compute is ~6 ms/frame (PERF.md);
everything above that is the link.  device_pairs_per_s reports the
chained-scan device-only throughput from PERF.json.
"""

REF_FPS = 4.2  # measured: mean of reference ttrack_seconds frames 1-4

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.io.native_loader import get_sequence
    from multimot_track_tpu.pipeline import batch as B_
    from multimot_track_tpu.pipeline import frames as F
    from multimot_track_tpu.pipeline.batch import run_sequence_batched

    seq = get_sequence("/root/reference/kitti_sample")
    frames = [seq.load_frame(i) for i in range(len(seq))]
    cfg = DEFAULT_CONFIG
    K = cfg.padding.k_obj_max
    n_pairs = len(frames) - 1

    # warm-up compiles the batched programs (and gives the sequential mode)
    run_sequence_batched(frames, cfg)

    # ---- sequential mode: one blocking round trip per request ----
    seq_durs = []
    for r in range(3):
        t0 = time.perf_counter()
        run_sequence_batched(frames, cfg, seed=100 + r)
        seq_durs.append(time.perf_counter() - t0)
    seq_durs.sort()
    seq_fps = n_pairs / seq_durs[len(seq_durs) // 2]

    # ---- streaming mode: all requests in flight, one final fetch ----
    base = dict(
        gray=np.stack([np.clip(np.round(f.gray), 0, 255).astype(np.uint8) for f in frames]),
        depth=np.stack([np.clip(f.depth_raw, 0, 65535).astype(np.uint16) for f in frames]),
        flow=np.stack([B_.pack_flow12(f.flow) for f in frames]),
        sem=np.stack([B_.pack_sem4(f.sem_mask) for f in frames]),
    )
    gts = [F.make_gt_table(f.pose_gt, f.obj_ids_gt, f.obj_poses_gt, K) for f in frames]
    gt_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gts)

    # median of 3 windows: the tunnel shows transient multi-second stalls
    # (measured 2x run-to-run swings); one window cannot be trusted alone
    reps = 10
    window_fps = []
    for w in range(3):
        t0 = time.perf_counter()
        handles = []
        for r in range(reps):
            # distinct request data: flip one low bit per rep (the remote
            # runtime dedups identical executions)
            g = base["gray"].copy()
            g.flat[w * reps + r] ^= 1
            gray = jnp.asarray(g)
            depth = jnp.asarray(base["depth"])
            flow = jnp.asarray(base["flow"])
            sem = jnp.asarray(base["sem"])
            obs = B_.frontend_batch(gray, depth, flow, sem, gt_stack, cfg)
            keys = jax.random.split(jax.random.PRNGKey(w * reps + r), n_pairs)
            handles.append(
                B_.track_batch_packed(keys, obs, gray, depth, sem, gt_stack, cfg)
            )
        results = [np.asarray(h) for h in handles]   # one draining fetch
        stream_s = time.perf_counter() - t0
        assert all(np.isfinite(v).all() for v in results)
        window_fps.append(reps * n_pairs / stream_s)
    window_fps.sort()
    fps = window_fps[1]

    out = {
        "metric": "kitti_sample_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS, 3),
        "sequential_fps": round(seq_fps, 3),
    }
    # device-compute-only throughput (PERF.md chained-scan slope timing,
    # immune to the tunnel) when characterized
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "PERF.json")) as f:
            perf = json.load(f)
        out["device_pairs_per_s"] = perf["track_pairs"]["device_pairs_per_s"]
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
