"""Benchmark: end-to-end multi-motion tracking frames/s on one chip.

Measures the TPU-native *batched* sequence mode (pipeline/batch.py): all
frame pairs of the sequence solved as one vmapped device program, images
uploaded per repetition (realistic streaming), results downloaded as one
packed vector.  This is the framework's production serving path; the
sequential online mode exists for latency-critical per-frame use.

Prints ONE JSON line:
  {"metric": "kitti_sample_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N / REF_FPS}

Baseline: the reference publishes no numbers, so we built and ran it on
this machine (tools/build_reference.sh, PARITY.md): steady-state tracking
takes 0.179-0.401 s/frame => 4.2 frames/s.  vs_baseline is the speed-up
over that measured reference throughput.
"""

REF_FPS = 4.2  # measured: mean of reference ttrack_seconds frames 1-4

import json
import os
import time

import jax
import numpy as np


def main():
    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.io.native_loader import get_sequence
    from multimot_track_tpu.pipeline.batch import run_sequence_batched
    from multimot_track_tpu.pipeline.system import MultiMotSystem

    seq = get_sequence("/root/reference/kitti_sample")
    frames = [seq.load_frame(i) for i in range(len(seq))]
    cfg = DEFAULT_CONFIG
    # warm-up compiles the batched programs
    run_sequence_batched(frames, cfg)

    # the tunnel-attached device shows transient multi-second stalls
    # (measured run-to-run variance ~40%); report the median rep so one
    # stall cannot dominate the metric
    reps = 10
    durs = []
    for r in range(reps):
        t0 = time.perf_counter()
        Tcw, res, records = run_sequence_batched(frames, cfg, seed=r)
        durs.append(time.perf_counter() - t0)
    durs.sort()
    med = durs[len(durs) // 2]
    fps = (len(frames) - 1) / med

    out = {
        "metric": "kitti_sample_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS, 3),
    }
    # device-compute-only throughput (PERF.md methodology: chained-scan
    # timing, immune to the tunnel's execution dedup) when characterized
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "PERF.json")) as f:
            perf = json.load(f)
        out["device_pairs_per_s"] = perf["track_pairs"]["device_pairs_per_s"]
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
