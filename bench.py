"""Benchmark: end-to-end multi-motion tracking frames/s on one chip.

Prints ONE JSON line:
  {"metric": "kitti_sample_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N / 10.0}

Baseline: the reference targets real-time KITTI at 10 Hz
(kitti_sample/kitti03.yaml Camera.fps, BASELINE.md) and publishes no other
number, so vs_baseline is the speed-up over that 10 frames/s budget.
"""

import dataclasses
import json
import time

import jax
import numpy as np


def main():
    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.io.kitti import KittiSequence
    from multimot_track_tpu.pipeline.system import MultiMotSystem

    seq = KittiSequence("/root/reference/kitti_sample")
    frames = [seq.load_frame(i) for i in range(len(seq))]

    cfg = DEFAULT_CONFIG
    sys_ = MultiMotSystem(cfg)
    # warm-up pass compiles the frontend + pair step
    for fd in frames[:2]:
        sys_.track_rgbd(fd)

    # timed: steady-state tracking over the sequence, repeated
    reps = 8
    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for fd in frames[2:]:
            r = sys_.track_rgbd(fd)
            n += 1
    jax.block_until_ready(r.Tcw_cur)
    dt = time.perf_counter() - t0
    fps = n / dt

    summary = sys_.summary()
    out = {
        "metric": "kitti_sample_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }
    print(json.dumps(out))
    # extra context on stderr-ish second line is not allowed; keep one line.


if __name__ == "__main__":
    main()
