"""Honest (fetch-based) decomposition of the track program's device time.

jax.block_until_ready is a NO-OP through the axon tunnel (measured: a
program whose fetch takes 1.25 s reports 0 ms under block_until_ready), so
every number here is wall time of dispatch + np.asarray of the packed
result, minus the measured null-RPC cost, on resident inputs with distinct
keys per repetition.
"""

import dataclasses
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


def main():
    base = DEFAULT_CONFIG
    K = base.padding.k_obj_max
    seq = get_sequence("/root/reference/kitti_sample")
    frames = [seq.load_frame(i) for i in range(len(seq))]
    Fn = len(frames)
    grays = np.stack([np.clip(np.round(fd.gray), 0, 255).astype(np.uint8) for fd in frames])
    depths = np.stack([np.clip(fd.depth_raw, 0, 65535).astype(np.uint16) for fd in frames])
    flows = np.stack([np.clip(fd.flow * 128.0, -32767, 32767).astype(np.int16) for fd in frames])
    sems = np.stack([np.clip(fd.sem_mask, 0, 255).astype(np.uint8) for fd in frames])
    gts = [F.make_gt_table(fd.pose_gt, fd.obj_ids_gt, fd.obj_poses_gt, K) for fd in frames]
    gt_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gts)
    gray_d = jnp.asarray(grays); depth_d = jnp.asarray(depths)
    flow_d = jnp.asarray(flows); sem_d = jnp.asarray(sems)
    obs = B.frontend_batch(gray_d, depth_d, flow_d, sem_d, gt_stack, base)
    np.asarray(jax.tree_util.tree_leaves(obs)[0][..., :1])

    # null RPC
    f_null = jax.jit(lambda x: x + 1.0)
    np.asarray(f_null(jnp.float32(0)))
    t0 = time.perf_counter(); np.asarray(f_null(jnp.float32(1)))
    null = time.perf_counter() - t0

    def timed(cfg, label, reps=3):
        def run(r):
            keys = jax.random.split(jax.random.PRNGKey(r), Fn - 1)
            return B.track_batch_packed(keys, obs, gray_d, depth_d, sem_d,
                                        gt_stack, cfg)
        np.asarray(run(0))  # compile
        ts = []
        for r in range(1, reps + 1):
            t0 = time.perf_counter()
            np.asarray(run(r))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        ms = (ts[len(ts) // 2] - null) * 1e3
        print(f"{label:55s} {ms:7.0f} ms")
        return ms

    S = base.solver

    def scfg(**kw):
        return base.replace(solver=dataclasses.replace(S, **kw))

    full = timed(base, "full default")
    timed(scfg(obj_ensemble_seeds=1), "obj ensemble 1 seed (vs 3)")
    timed(scfg(obj_reclassify_rounds=0), "obj reclassify 0 (vs 2)")
    timed(scfg(obj_lm_iters=1), "obj LM 1 iter (vs 100)")
    timed(scfg(obj_ransac_iters=250), "obj RANSAC 250 (vs 2000)")
    timed(scfg(symmetric_cam=False), "cam symmetric OFF")
    timed(scfg(cam_lm_iters=1), "cam LM 1 iter (vs 50)")
    timed(scfg(ransac_iters=250), "cam RANSAC 250 (vs 500)")
    timed(scfg(refine_gn_iters=1), "GN refine 1 (vs 10)")
    timed(scfg(obj_lm_iters=1, cam_lm_iters=1, refine_gn_iters=1,
               obj_reclassify_rounds=0, symmetric_cam=False),
          "all LM/GN minimal (isolates non-solver cost)")
    print(f"{'(null RPC subtracted)':55s} {null*1e3:7.0f} ms")


if __name__ == "__main__":
    main()
