"""Synthetic sequence construction (test/dev fixtures).

The reference has no test assets beyond kitti_sample (SURVEY.md §4);
loop-closing needs a revisit, so we synthesize one: play a sequence
forward then reversed — the tail revisits the head exactly.  No flow
files are written; the loader's on-device dense-flow fallback covers
every pair, exercising the self-contained path.
"""

from __future__ import annotations

import pathlib
import shutil


def build(src, dst, include_objects: bool = False, order=None):
    """``order`` — explicit source-frame index sequence; default is one
    forward + one reversed pass.  Longer shuttle patterns (fwd-rev-fwd-…)
    make marathon fixtures with repeated revisits."""
    src = pathlib.Path(src)
    dst = pathlib.Path(dst)
    if dst.exists():
        shutil.rmtree(dst)
    (dst / "image").mkdir(parents=True)
    (dst / "depth").mkdir()
    (dst / "semantic").mkdir()

    n = len(list((src / "image").glob("*.png")))
    if order is None:
        order = list(range(n)) + list(range(n - 2, -1, -1))

    for out_i, in_i in enumerate(order):
        for sub, ext in (("image", "png"), ("depth", "png"), ("semantic", "txt")):
            s = src / sub / f"{in_i:06d}.{ext}"
            d = dst / sub / f"{out_i:06d}.{ext}"
            try:
                d.symlink_to(s)
            except OSError:
                shutil.copy(s, d)

    poses = {}
    for line in (src / "pose_gt.txt").read_text().splitlines():
        parts = line.split()
        if parts:
            poses[int(float(parts[0]))] = parts[1:]
    with open(dst / "pose_gt.txt", "w") as f:
        for out_i, in_i in enumerate(order):
            if in_i in poses:
                f.write(f"{out_i} " + " ".join(poses[in_i]) + "\n")

    with open(dst / "times.txt", "w") as f:
        for out_i in range(len(order)):
            f.write(f"{out_i * 0.1:.6e}\n")

    if include_objects and (src / "object_pose.txt").exists():
        rows = {}
        for line in (src / "object_pose.txt").read_text().splitlines():
            parts = line.split()
            if parts:
                rows.setdefault(int(float(parts[0])), []).append(parts[1:])
        with open(dst / "object_pose.txt", "w") as f:
            for out_i, in_i in enumerate(order):
                for r in rows.get(in_i, []):
                    f.write(f"{out_i} " + " ".join(r) + "\n")
    return len(order)


