"""Automated parity comparison: ours vs the reference on kitti_sample.

Runs this framework over the sample and parses a reference run log
(produced by tools/build_reference.sh) into one side-by-side table —
the source of PARITY.md, re-runnable every round to track regressions.

  python tools/compare_parity.py [--ref-log /tmp/ref_run.log] [--cpu]
"""

from __future__ import annotations

import argparse
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def parse_reference_log(path):
    """Extract per-pair camera/object RPE + speed lines from the reference's
    stdout (src/Tracking.cc print formats)."""
    text = open(path).read()
    cam = [
        (float(m.group(1)), float(m.group(2)))
        for m in re.finditer(
            r"relative pose error of estimated camera pose, t: ([\d.]+)% R: ([\d.]+)deg/m",
            text,
        )
    ]
    obj = [
        (float(m.group(1)), float(m.group(2)))
        for m in re.finditer(
            r"relative pose error of the object, t: ([\d.]+)% R: ([\d.]+)deg/m", text
        )
    ]
    speed = [
        (float(m.group(1)), float(m.group(2)))
        for m in re.finditer(
            r"estimated and ground truth object speed: ([\d.]+)km/h ([\d.]+)km/h", text
        )
    ]
    times = [float(m.group(1)) for m in re.finditer(r"ttrack_seconds: ([\d.]+)", text)]
    return dict(cam=cam, obj=obj, speed=speed, times=times)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-log", default="/tmp/ref_run.log")
    ap.add_argument("--sequence", default="/root/reference/kitti_sample")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    try:
        ref = parse_reference_log(args.ref_log)
    except FileNotFoundError:
        print(f"reference log {args.ref_log} missing — run tools/build_reference.sh first")
        ref = None

    from multimot_track_tpu.io.kitti import KittiSequence
    from multimot_track_tpu.pipeline.system import run_sequence

    seq = KittiSequence(args.sequence)
    sys_ = run_sequence(seq)
    ours_cam = [(r[0] * 100, r[1]) for r in sys_.map.cam_rpe_rel]
    ours_obj = [
        (o.t_rpe_rel * 100, o.r_rpe_rel, o.speed_est, o.speed_gt)
        for o in sys_.map.obj_records
        if o.has_gt
    ]

    print("\npair | ref cam t% | ours cam t% | ref obj t% | ours obj t% | "
          "ref speed | ours speed")
    n = len(ours_cam)
    for k in range(n):
        rc = f"{ref['cam'][k][0]:.2f}" if ref and k < len(ref["cam"]) else "-"
        ro = f"{ref['obj'][k][0]:.2f}" if ref and k < len(ref["obj"]) else "-"
        rs = (
            f"{ref['speed'][k][0]:.1f}/{ref['speed'][k][1]:.1f}"
            if ref and k < len(ref["speed"])
            else "-"
        )
        oc = f"{ours_cam[k][0]:.2f}"
        oo = f"{ours_obj[k][0]:.2f}" if k < len(ours_obj) else "-"
        osp = f"{ours_obj[k][2]:.1f}/{ours_obj[k][3]:.1f}" if k < len(ours_obj) else "-"
        print(f"{k}->{k+1} | {rc} | {oc} | {ro} | {oo} | {rs} | {osp}")

    mc = sum(c[0] for c in ours_cam) / max(len(ours_cam), 1)
    mo = sum(o[0] for o in ours_obj) / max(len(ours_obj), 1)
    line = f"\nmeans: ours cam {mc:.2f}% obj {mo:.2f}%"
    if ref and ref["cam"]:
        rmc = sum(c[0] for c in ref["cam"]) / len(ref["cam"])
        rmo = sum(o[0] for o in ref["obj"]) / max(len(ref["obj"]), 1)
        line += f" | reference cam {rmc:.2f}% obj {rmo:.2f}%"
        if ref["times"][1:]:
            ts = ref["times"][1:]
            line += f" | reference {len(ts)/sum(ts):.2f} frames/s"
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
