"""Per-section timing of run_sequence_batched reps (tunnel diagnosis)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.native_loader import get_sequence
from multimot_track_tpu.pipeline import batch as B
from multimot_track_tpu.pipeline import frames as F
from multimot_track_tpu.pipeline import tracker


def main():
    cfg = DEFAULT_CONFIG
    K = cfg.padding.k_obj_max
    seq = get_sequence("/root/reference/kitti_sample")
    frames = [seq.load_frame(i) for i in range(len(seq))]
    Fn = len(frames)

    B.run_sequence_batched(frames, cfg)  # warm-up compile

    for r in range(6):
        t0 = time.perf_counter()
        grays, depths, flows, sems, gts = [], [], [], [], []
        for fd in frames:
            grays.append(np.clip(np.round(fd.gray), 0, 255).astype(np.uint8))
            depths.append(np.clip(fd.depth_raw, 0, 65535).astype(np.uint16))
            flows.append(np.clip(fd.flow * 128.0, -32767, 32767).astype(np.int16))
            sems.append(np.clip(fd.sem_mask, 0, 255).astype(np.uint8))
            gts.append(F.make_gt_table(fd.pose_gt, fd.obj_ids_gt, fd.obj_poses_gt, K))
        t1 = time.perf_counter()
        gray_u8 = jnp.asarray(np.stack(grays))
        depth_u16 = jnp.asarray(np.stack(depths))
        flow_i16 = jnp.asarray(np.stack(flows))
        sem_u8 = jnp.asarray(np.stack(sems))
        gt_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gts)
        for x in (gray_u8, depth_u16, flow_i16, sem_u8):
            x.block_until_ready()
        t2 = time.perf_counter()
        obs = B.frontend_batch(gray_u8, depth_u16, flow_i16, sem_u8, gt_stack, cfg)
        t3 = time.perf_counter()
        keys = jax.random.split(jax.random.PRNGKey(r), Fn - 1)
        packed = B.track_batch_packed(keys, obs, gray_u8, depth_u16, sem_u8,
                                      gt_stack, cfg)
        t4 = time.perf_counter()
        out = np.asarray(packed)
        t5 = time.perf_counter()
        print(f"rep {r}: host-prep {t1-t0:.3f}s  upload {t2-t1:.3f}s  "
              f"frontend-dispatch {t3-t2:.3f}s  track-dispatch {t4-t3:.3f}s  "
              f"fetch {t5-t4:.3f}s  TOTAL {t5-t0:.3f}s")


if __name__ == "__main__":
    main()
