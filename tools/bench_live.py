"""Live-mode (frame-by-frame, FULL backend) serving benchmark.

Measures MultiMotSystem.track_rgbd end-to-end through the link: keyframes
+ local map + trailing-window BA + joint ego+object BA + loop detection,
one frame in -> one result out per call (the reference's interactive
TrackRGBD contract, Examples/RGB-D/rgbd_tum.cc:158-203).

Methodology matches bench.py: 57-frame tiled kitti_sample, per-occurrence
gray-bit flips against execution dedup, prefetch thread overlapping the
next frame's pack+upload with the current solve.  A full warmup pass
first (compiles every program variant incl. keyframe-cadence work); the
timed pass then reports median and total frames/s.

  python tools/bench_live.py [--frames 57] [--unfused|--pipelined] [--runs 1]
"""

import argparse
import json
import pathlib
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def build_frames(n_frames):
    from multimot_track_tpu.io.native_loader import get_sequence

    seq = get_sequence("/root/reference/kitti_sample")
    base = [seq.load_frame(i) for i in range(len(seq))]
    order = [i % len(base) for i in range(n_frames)]
    return [base[i] for i in order]


def run_pass(frames, cfg, tag, timed, pipelined=False):
    import dataclasses

    from multimot_track_tpu.pipeline.system import MultiMotSystem

    sys_ = MultiMotSystem(cfg, pipelined=pipelined)
    pool = ThreadPoolExecutor(1)

    def prep(i):
        fd = frames[i]
        g = fd.gray.copy()
        # unique input per (pass, occurrence): dedup defense
        g.flat[(hash(tag) % 997 * len(frames) + i) % g.size] += 1.0
        fd = dataclasses.replace(fd, gray=g) if dataclasses.is_dataclass(fd) \
            else fd._replace(gray=g)
        return fd, sys_.upload(fd)

    fut = pool.submit(prep, 0)
    times = []
    for i in range(len(frames)):
        fd, handles = fut.result()
        if i + 1 < len(frames):
            fut = pool.submit(prep, i + 1)
        t0 = time.perf_counter()
        sys_.track_rgbd(fd, uploaded=handles)
        times.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    sys_.flush()
    flush_s = time.perf_counter() - t0
    pool.shutdown()
    if not timed:
        return None
    times = times[1:] + ([flush_s] if pipelined else [])
    return np.asarray(times), sys_  # drop frame 0 (frontend only)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=57)
    ap.add_argument("--unfused", action="store_true")
    ap.add_argument("--pipelined", action="store_true")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    import dataclasses

    from multimot_track_tpu.config import DEFAULT_CONFIG

    cfg = DEFAULT_CONFIG
    if args.unfused:
        cfg = dataclasses.replace(
            cfg, backend=dataclasses.replace(cfg.backend, fused_refine=False)
        )

    frames = build_frames(args.frames)
    run_pass(frames[: min(24, args.frames)], cfg, "warmup", timed=False,
             pipelined=args.pipelined)

    best = None
    nb = 5  # kitti_sample length; wrap pairs (4 -> 0) carry reused flow
    order = [i % nb for i in range(args.frames)]
    genuine = [k for k in range(args.frames - 1) if order[k + 1] == order[k] + 1]

    for r in range(args.runs):
        times, sys_ = run_pass(frames, cfg, f"timed{r}", timed=True,
                               pipelined=args.pipelined)
        med = float(np.median(times))
        rpe = [
            float(sys_.map.cam_rpe_rel[j][0])
            for j in genuine
            if j < len(sys_.map.cam_rpe_rel)
        ]
        out = {
            "mode": ("unfused" if args.unfused else
                     "pipelined" if args.pipelined else "fused"),
            "n_frames": len(frames),
            "median_s_per_frame": round(med, 4),
            "median_fps": round(1.0 / med, 2),
            "total_fps": round(len(times) / float(times.sum()), 2),
            "p90_s": round(float(np.percentile(times, 90)), 4),
            "cam_t_rpe_rel_mean": round(
                float(sys_.summary()["cam_t_rpe_rel_mean"]), 4
            ),
            # wrap pairs reuse frame 4's flow for a 4->0 jump; only the
            # genuine consecutive pairs measure real tracking quality
            "cam_t_rpe_genuine_pairs": round(float(np.mean(rpe)), 4),
        }
        print(json.dumps(out))
        if best is None or out["median_fps"] > best["median_fps"]:
            best = out
    return best


if __name__ == "__main__":
    main()
