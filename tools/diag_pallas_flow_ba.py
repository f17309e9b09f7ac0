"""Compare the fused Pallas flow-BA kernel vs the XLA backend on hardware.

Timing uses the chained-scan methodology (PERF.md): N executions inside one
lax.scan whose carry perturbs the next iteration's inputs, so the tunnel
runtime cannot dedup identical executions.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.geometry import se3, camera
from multimot_track_tpu.solvers.flow_ba import FlowBAParams, solve_flow_ba
from multimot_track_tpu.solvers.flow_ba_pallas import solve_flow_ba_pallas

FX, FY, CX, CY = 721.5377, 721.5377, 609.5593, 172.854


def make_problem(seed, N=2048, n_valid=1800):
    rng = np.random.default_rng(seed)
    uv = np.stack([rng.uniform(50, 1150, N), rng.uniform(50, 330, N)], -1).astype(np.float32)
    depth = rng.uniform(4.0, 30.0, N).astype(np.float32)
    valid = np.arange(N) < n_valid
    xi = np.array([0.004, -0.01, 0.002, 0.3, -0.05, 1.1], np.float32)
    T_true = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    Xw = np.asarray(camera.backproject(jnp.asarray(uv), jnp.asarray(depth), FX, FY, CX, CY))
    y = (T_true[:3, :3] @ Xw.T).T + T_true[:3, 3]
    uv_cur = np.asarray(camera.project(jnp.asarray(y), FX, FY, CX, CY))
    flow = (uv_cur - uv + rng.normal(0, 0.05, (N, 2))).astype(np.float32)
    flow[:180] += rng.normal(0, 20.0, (180, 2))
    return uv, flow, depth, valid, T_true


def chain_time(solver, uv, flow, depth, valid, p, reps=32):
    uv, flow, depth, valid = map(jnp.asarray, (uv, flow, depth, valid))
    Twl = jnp.eye(4)

    @jax.jit
    def chained(tok):
        def step(carry, x):
            # genuine data dependence: perturb flow by carry-derived epsilon
            res = solver(jnp.eye(4), Twl, uv, flow + carry * 1e-6, depth,
                         valid, FX, FY, CX, CY, params=p)
            return res.T[0, 3] * 1e-9 + x * 1e-9, res.T
        c, Ts = jax.lax.scan(step, tok, jnp.arange(reps, dtype=jnp.float32))
        return c, Ts[-1]

    c, T = chained(jnp.float32(0.0))
    jax.block_until_ready((c, T))
    t0 = time.perf_counter()
    c, T = chained(jnp.float32(1.0))
    jax.block_until_ready((c, T))
    dt = time.perf_counter() - t0
    return dt / reps, np.asarray(T)


def main():
    print("devices:", jax.devices())
    uv, flow, depth, valid, T_true = make_problem(0)
    p = FlowBAParams(iters=50)

    # correctness on device
    args = (jnp.eye(4), jnp.eye(4), jnp.asarray(uv), jnp.asarray(flow),
            jnp.asarray(depth), jnp.asarray(valid), FX, FY, CX, CY)
    r_x = solve_flow_ba(*args, params=p)
    r_p = solve_flow_ba_pallas(*args, params=p)
    Tx, Tp = np.asarray(r_x.T), np.asarray(r_p.T)
    print("XLA  T err vs true:", np.linalg.norm(Tx[:3, 3] - T_true[:3, 3]))
    print("PAL  T err vs true:", np.linalg.norm(Tp[:3, 3] - T_true[:3, 3]))
    print("max |T_x - T_p|:", np.abs(Tx - Tp).max())
    print("inliers:", int(r_x.n_inliers), int(r_p.n_inliers))

    tx, _ = chain_time(solve_flow_ba, uv, flow, depth, valid, p)
    tp, _ = chain_time(solve_flow_ba_pallas, uv, flow, depth, valid, p)
    print(f"XLA    backend: {tx*1e3:.3f} ms/solve")
    print(f"Pallas backend: {tp*1e3:.3f} ms/solve   speedup {tx/tp:.2f}x")

    # batched (object-path shape): K*streams = 12 problems of 4096 pts
    probs = [make_problem(s, N=4096, n_valid=3000) for s in range(12)]
    stack = lambda i: jnp.stack([jnp.asarray(pr[i]) for pr in probs])
    uvB, flowB, depthB, validB = stack(0), stack(1), stack(2), stack(3)
    T0B = jnp.stack([jnp.eye(4)] * 12)
    pobj = FlowBAParams(prior_info=0.5, rp_thres=0.01, iters=100)

    for name, solver in (("XLA", solve_flow_ba), ("Pallas", solve_flow_ba_pallas)):
        vs = jax.vmap(lambda t0, u, f, d, v: solver(
            t0, jnp.eye(4), u, f, d, v, FX, FY, CX, CY, params=pobj))

        @jax.jit
        def chained(tok):
            def step(carry, x):
                res = vs(T0B, uvB, flowB + carry * 1e-6, depthB, validB)
                return res.T[0, 0, 3] * 1e-9, res.T
            c, Ts = jax.lax.scan(step, tok, jnp.arange(8, dtype=jnp.float32))
            return c, Ts[-1]

        c, T = chained(jnp.float32(0.0)); jax.block_until_ready((c, T))
        t0 = time.perf_counter()
        c, T = chained(jnp.float32(1.0)); jax.block_until_ready((c, T))
        dt = (time.perf_counter() - t0) / 8
        print(f"{name} batched 12x4096 objects: {dt*1e3:.3f} ms/batch-solve")


if __name__ == "__main__":
    main()
