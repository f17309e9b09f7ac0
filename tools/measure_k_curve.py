"""Object-capacity cost curve: device pair time vs object-slot capacity K
and solve-batch size k_obj_solve (VERDICT r3 #8).

The reference's association tables handle ~12 concurrent objects
(src/Tracking.cc:704-748); our default is K=8 slots with a top-6 solve
batch.  The vmapped ensemble solve is the dominant device cost and scales
linearly in its batch — this tool quantifies the trade on the real chip
using the same slope-timed full tracker program as perf_characterize.

Writes KCURVE.json.  Each new (K, solve) shape costs ~4-5 min of remote
compile through the tunnel — run in background with a generous timeout:
  timeout 3500 python tools/measure_k_curve.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf_characterize import characterize_track_pairs  # noqa: E402


def main():
    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.io.kitti import KittiSequence

    seq = KittiSequence("/root/reference/kitti_sample")
    frames = [seq.load_frame(i) for i in range(len(seq))]

    rows = []
    for k_max, k_solve in ((4, 0), (8, 4), (8, 6), (8, 0), (12, 6), (12, 0)):
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            padding=dataclasses.replace(
                DEFAULT_CONFIG.padding, k_obj_max=k_max, k_obj_solve=k_solve
            ),
        )
        r = characterize_track_pairs(frames, cfg, n_pairs=4)
        row = {
            "k_obj_max": k_max,
            "k_obj_solve": k_solve or k_max,
            "device_ms_per_pair": r["device_ms_per_pair"],
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    base = next(r for r in rows if r["k_obj_max"] == 4)["device_ms_per_pair"]
    for r in rows:
        r["vs_k4"] = round(r["device_ms_per_pair"] / base, 3)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "KCURVE.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote KCURVE.json")


if __name__ == "__main__":
    main()
