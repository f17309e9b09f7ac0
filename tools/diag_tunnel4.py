"""Nature of the per-launch overhead: HLO-size vs device-runtime vs polling.

Programs timed (dispatch+fetch, resident inputs, distinct data per rep):
  1. null          (x+1 scalar)            — baseline RPC
  2. matmul-heavy  (~30 ms device, tiny HLO)
  3. scan-light    (5000-step trivial scan — big runtime estimate? tiny HLO)
  4. track @ iters cut to 5/10             — same HLO graph size, less runtime
  5. chained-scan track x8                 — amortization check: 8 solves, 1 launch
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, inputs, reps=3):
    outs = fn(*inputs(0))
    jax.tree_util.tree_map(np.asarray, outs)
    ts = []
    for r in range(1, reps + 1):
        args = inputs(r)
        t0 = time.perf_counter()
        o = fn(*args)
        jax.tree_util.tree_map(np.asarray, o)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label}: median {ts[len(ts)//2]*1e3:.0f} ms  (all {[f'{t*1e3:.0f}' for t in ts]})")


def main():
    # 1. null
    f_null = jax.jit(lambda x: x + 1.0)
    bench("null", f_null, lambda r: (jnp.float32(r),))

    # 2. matmul-heavy: 2048^3 matmul chain, ~50 steps -> ~30 ms on v5e bf16
    A = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def f_mm(x):
        def body(c, _):
            return (c @ A) * (1.0 / 2048.0), ()
        c, _ = jax.lax.scan(body, x, None, length=50)
        return jnp.sum(c.astype(jnp.float32))

    bench("matmul-heavy(50x2048^3)", f_mm, lambda r: (jnp.full((2048, 2048), r, jnp.bfloat16),))

    # 3. scan-light: long sequential chain, trivial flops
    @jax.jit
    def f_scan(x):
        def body(c, _):
            return c * 1.000001 + 1e-9, ()
        c, _ = jax.lax.scan(body, x, None, length=5000)
        return c

    bench("scan-light(5000 steps)", f_scan, lambda r: (jnp.float32(r),))

    # 4/5: track program variants
    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.io.native_loader import get_sequence
    from multimot_track_tpu.pipeline import batch as B
    from multimot_track_tpu.pipeline import frames as F
    import dataclasses

    cfg = DEFAULT_CONFIG
    K = cfg.padding.k_obj_max
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
    obs = B.frontend_batch(gray_d, depth_d, flow_d, sem_d, gt_stack, cfg)

    def track_inputs(r):
        return (jax.random.split(jax.random.PRNGKey(r), Fn - 1), obs,
                gray_d, depth_d, sem_d, gt_stack)

    bench("track default", lambda *a: B.track_batch_packed(*a, cfg), track_inputs)

    cfg5 = dataclasses.replace(
        cfg, solver=dataclasses.replace(
            cfg.solver, cam_lm_iters=5, obj_lm_iters=10,
            ransac_iters=100, obj_ransac_iters=200))
    bench("track iters 5/10", lambda *a: B.track_batch_packed(*a, cfg5), track_inputs)


if __name__ == "__main__":
    main()
