"""LM iteration-budget sweep: accuracy (kitti_sample parity) per config.

The LM chains are the device critical path (PERF.md): camera 2x100
sequential iterations (symmetric), objects 200 + 2x200 reclassify.  This
sweep measures what the iteration budget actually buys on the metric.

  JAX_PLATFORMS=cpu python tools/diag_iters.py
"""

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline.system import MultiMotSystem


def run(cfg, seq):
    sys_ = MultiMotSystem(cfg)
    for i in range(5):
        sys_.track_rgbd(seq.load_frame(i))
    return sys_.summary()


def main():
    seq = KittiSequence("/root/reference/kitti_sample")
    base = DEFAULT_CONFIG
    variants = [
        ("default (cam100 obj200)", base),
        ("cam50 obj100", base.replace(solver=dataclasses.replace(
            base.solver, cam_lm_iters=50, obj_lm_iters=100))),
        ("cam30 obj60", base.replace(solver=dataclasses.replace(
            base.solver, cam_lm_iters=30, obj_lm_iters=60))),
        ("cam20 obj40", base.replace(solver=dataclasses.replace(
            base.solver, cam_lm_iters=20, obj_lm_iters=40))),
    ]
    for name, cfg in variants:
        t0 = time.time()
        s = run(cfg, seq)
        print(
            f"{name:28s} cam {s['cam_t_rpe_rel_mean']*100:.3f}% "
            f"ref {s['cam_t_rpe_refined_mean']*100:.3f}% "
            f"obj {s['obj_t_rpe_rel_mean']*100:.3f}% "
            f"spd {s['obj_speed_err_rel_mean']*100:.2f}% "
            f"ate {s['ego_ate_rmse_m']*100:.2f}cm  ({time.time()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
