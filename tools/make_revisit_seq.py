"""Synthesize a revisit sequence (see multimot_track_tpu/io/synth.py).

  python tools/make_revisit_seq.py [SRC] [DST]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimot_track_tpu.io.synth import build

if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/kitti_sample"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kitti_revisit"
    n = build(src, dst)
    print(f"wrote {n}-frame revisit sequence to {dst}")
