"""Fused Pallas TPU kernel for the flow-BA Levenberg-Marquardt solve.

``solvers/flow_ba.solve_flow_ba`` expresses one LM iteration as ~100 small
XLA ops (projection, Jacobian planes, 27 masked reductions, a 6x6 solve,
exp/compose); measured on a v5e chip each iteration costs ~37 us even
though it is only ~6 MFLOP at N=2048 — the loop is op-overhead/latency
bound, and the LM chain (2 symmetric camera solves + a reclassify re-solve
+ the per-object solves) is the critical path of the whole tracker
(PERF.md).  This module runs the *entire* LM loop as ONE Pallas kernel:

* per-point quantities live as (R, 128) float32 planes in VMEM (N = R*128,
  the framework's padded sizes 2048/4096 are lane-aligned by construction),
* the pose, damping and bookkeeping ride a `lax.while_loop` scalar carry,
  so the early-exit convergence gate (rel_tol) is preserved,
* the reduced 6x6 Schur system is solved by an unrolled scalar Cholesky
  (geometry/smallsolve.py's trick, specialised to in-kernel scalars),
* the Jacobian is never materialised: the 12 A-planes are formed and
  consumed inside the same VPU pass that accumulates the 21 upper-triangle
  Hessian entries.

Numerics mirror ``solve_flow_ba`` exactly (same measurement model as the
reference's EdgeSE3ProjectFlow2, types_six_dof_expmap.h:429-470; same
Nielsen lambda schedule as g2o's Levenberg strategy) — the parity test
``tests/test_flow_ba_pallas.py`` pins the two backends together.  The
reduction order over points differs (plane-wise tree reduce vs XLA's),
so agreement is to float32 tolerance, not bit-exact.

TOOLCHAIN ERRATUM (axon-tunnelled v5e, jax 0.9 Mosaic, 2026-08): a
SINGLE-instance execution of this kernel placed inside ``lax.scan``
miscompiles — the while_loop's lambda seed reads corrupted input and the
solve returns its init pose after one rejected step.  Verified-correct
forms: direct/jit calls (any nesting except scan), ``vmap`` with batch
>= 2 (including inside scan — the full tracker program under a scanned
benchmark matches the XLA backend to 1e-6), and the framework's
production paths, which are exactly those forms.  Minimal kernels
reproducing each individual feature (array/bool/scalar while carries,
3-D operands, transposed operands, scalar-row reads) all pass — the
trigger is this kernel as a whole, batch size <= 1, under scan.  If you
must scan an unbatched solve, use ``backend="xla"`` for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimot_track_tpu.geometry import camera, se3
from multimot_track_tpu.solvers.flow_ba import FlowBAParams, FlowBAResult

_LANES = 128


def _chol_solve6(H, g):
    """x = H^{-1} g for a 6x6 SPD H given as lists of scalars.

    H: list-of-lists (row-major, full), g: list of 6 scalars.  Unrolled at
    trace time — pure scalar ops, no arrays (smallsolve.solve_spd6 logic).
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _exp_se3_scalar(xi):
    """se(3) exp on 6 scalars (omega, upsilon) -> (R 3x3 list, t 3 list).

    Mirrors geometry/se3.exp_se3 (incl. its eps regularisation) so the LM
    trajectory matches the XLA backend step for step."""
    EPS = 1e-8
    w0, w1, w2, u0, u1, u2 = xi
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    th = jnp.sqrt(th2 + EPS * EPS)
    small = th2 < 1e-10
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / (th2 + EPS * EPS))
    c = jnp.where(
        small, 1.0 / 6.0 - th2 / 120.0, (th - jnp.sin(th)) / (th2 * th + EPS)
    )
    # K = hat(w); R = I + a K + b K^2 ; V = I + b K + c K^2
    K = [[0.0, -w2, w1], [w2, 0.0, -w0], [-w1, w0, 0.0]]
    K2 = [
        [
            sum(K[i][k] * K[k][j] for k in range(3))
            for j in range(3)
        ]
        for i in range(3)
    ]
    eye = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    R = [[eye[i][j] + a * K[i][j] + b * K2[i][j] for j in range(3)] for i in range(3)]
    V = [[eye[i][j] + b * K[i][j] + c * K2[i][j] for j in range(3)] for i in range(3)]
    u = [u0, u1, u2]
    t = [sum(V[i][j] * u[j] for j in range(3)) for i in range(3)]
    return R, t


def _compose(Ra, ta, Rb, tb):
    """(Ra, ta) @ (Rb, tb) as scalar lists."""
    R = [
        [sum(Ra[i][k] * Rb[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    t = [sum(Ra[i][k] * tb[k] for k in range(3)) + ta[i] for i in range(3)]
    return R, t


def _make_kernel(p: FlowBAParams, fx, fy, cx, cy):
    """Kernel factory: params/intrinsics are compile-time constants."""
    wp0 = p.reproj_info
    wf0 = p.prior_info
    d2 = p.rp_thres

    def kernel(tin_ref, xw_ref, obs_ref, fm_ref, val_ref, wpt_ref,
               tout_ref, fout_ref, chi2_ref, stats_ref):
        X0 = xw_ref[0]
        X1 = xw_ref[1]
        X2 = xw_ref[2]
        ob0 = obs_ref[0]
        ob1 = obs_ref[1]
        fm0 = fm_ref[0]
        fm1 = fm_ref[1]
        vmask = val_ref[0]                      # (R, 128) 0/1 float
        wpt = wpt_ref[0]                        # per-point info scale
        wf = wf0 * vmask

        T0 = [[tin_ref[0, 4 * i + j] for j in range(3)] for i in range(3)]
        t0 = [tin_ref[0, 4 * i + 3] for i in range(3)]

        def transform(R, t):
            y0 = R[0][0] * X0 + R[0][1] * X1 + R[0][2] * X2 + t[0]
            y1 = R[1][0] * X0 + R[1][1] * X1 + R[1][2] * X2 + t[1]
            y2 = R[2][0] * X0 + R[2][1] * X1 + R[2][2] * X2 + t[2]
            return y0, y1, y2

        def objective(R, t, f0, f1):
            """Robust total objective F (valid-masked), as in _residual_chi2."""
            y0, y1, y2 = transform(R, t)
            iz = 1.0 / (y2 + 1e-9)
            r0 = (ob0 + f0) - (fx * y0 * iz + cx)
            r1 = (ob1 + f1) - (fy * y1 * iz + cy)
            chi2w = wpt * wp0 * (r0 * r0 + r1 * r1)
            rho = jnp.where(
                chi2w <= d2,
                chi2w,
                2.0 * jnp.sqrt(d2 * jnp.maximum(chi2w, 1e-20)) - d2,
            )
            rf0 = f0 - fm0
            rf1 = f1 - fm1
            chi2f = wf0 * (rf0 * rf0 + rf1 * rf1)
            return jnp.sum(jnp.where(vmask > 0, rho + chi2f, 0.0))

        # ---- lambda seed: tau * max(diag scale) (solve_flow_ba:175-180) ----
        y0i, y1i, y2i = transform(T0, t0)
        zi = jnp.maximum(y2i, 1e-6)
        scale = (fx / zi) ** 2 + (fy / zi) ** 2
        lam0 = p.tau * jnp.maximum(
            jnp.max(jnp.where(vmask > 0, wpt * wp0 * scale, 0.0)), 1.0
        )

        F0 = objective(T0, t0, fm0, fm1)

        def body(state):
            (it, R00, R01, R02, R10, R11, R12, R20, R21, R22,
             tx, ty, tz, f0, f1, F, lam, nu, done) = state
            R = [[R00, R01, R02], [R10, R11, R12], [R20, R21, R22]]
            t = [tx, ty, tz]

            # ---- build: residuals, robust weights, Jacobian planes ----
            y0, y1, y2 = transform(R, t)
            iz_r = 1.0 / (y2 + 1e-9)                       # residual projection
            r0 = (ob0 + f0) - (fx * y0 * iz_r + cx)
            r1 = (ob1 + f1) - (fy * y1 * iz_r + cy)
            chi2w = wpt * wp0 * (r0 * r0 + r1 * r1)
            w_rob = jnp.where(
                chi2w <= d2, 1.0, jnp.sqrt(d2 / jnp.maximum(chi2w, 1e-20))
            )
            wp = wpt * wp0 * w_rob * vmask

            iz = 1.0 / jnp.maximum(y2, 1e-6)               # Jacobian projection
            a = fx * iz
            b = -fx * y0 * iz * iz
            c = fy * iz
            d = -fy * y1 * iz * iz
            # A = d r_p/d xi, xi = (omega, ups): A0 row (du), A1 row (dv)
            A0 = (-b * y1, -a * y2 + b * y0, a * y1, -a, 0.0, -b)
            A1 = (c * y2 - d * y1, d * y0, -c * y0, 0.0, -c, -d)

            # flow block h_ff = wp + wf + lam; Schur weight wH = wp(wf+lam)/h_ff
            h_ff = wp + wf + lam
            inv_h = 1.0 / h_ff
            wH = wp * (wf + lam) * inv_h
            # effective rhs per point: e = wp[(1 - wp/h)r_p - (wf/h)r_f]
            rf0 = f0 - fm0
            rf1 = f1 - fm1
            k1 = 1.0 - wp * inv_h
            k2 = wf * inv_h
            e0 = wp * (k1 * r0 - k2 * rf0)
            e1 = wp * (k1 * r1 - k2 * rf1)

            # upper-triangle reduced Hessian + gradient.  The only float
            # entries in A0/A1 are literal zeros (A0[4], A1[3]) — products
            # with them vanish at trace time, so each entry reduces to the
            # minimal set of VPU multiply+reduce passes.
            def _mul(x, y):
                if isinstance(x, float) or isinstance(y, float):
                    return 0.0
                return x * y

            H = [[None] * 6 for _ in range(6)]
            g = [None] * 6
            for i in range(6):
                for j in range(i, 6):
                    acc = _mul(A0[i], A0[j])
                    acc2 = _mul(A1[i], A1[j])
                    acc = acc2 if isinstance(acc, float) else (
                        acc if isinstance(acc2, float) else acc + acc2
                    )
                    Hij = (
                        jnp.float32(0.0)
                        if isinstance(acc, float)
                        else jnp.sum(wH * acc)
                    )
                    H[i][j] = Hij
                    H[j][i] = Hij
                gacc = _mul(A0[i], e0)
                gacc2 = _mul(A1[i], e1)
                gacc = gacc2 if isinstance(gacc, float) else (
                    gacc if isinstance(gacc2, float) else gacc + gacc2
                )
                g[i] = (
                    jnp.float32(0.0)
                    if isinstance(gacc, float)
                    else jnp.sum(gacc)
                )
            for i in range(6):
                H[i][i] = H[i][i] + lam

            dxi = _chol_solve6(H, [-gi for gi in g])

            # flow back-substitution: df = -(g_f + wp * A dxi) / h_ff
            gf0 = wp * r0 + wf * rf0
            gf1 = wp * r1 + wf * rf1
            Ad0 = sum(A0[k] * dxi[k] for k in range(6) if not isinstance(A0[k], float))
            Ad1 = sum(A1[k] * dxi[k] for k in range(6) if not isinstance(A1[k], float))
            df0 = -(gf0 + wp * Ad0) * inv_h
            df1 = -(gf1 + wp * Ad1) * inv_h

            # predicted reduction over both blocks (g_red via Schur identity:
            # dot(dxi, -g_red) = -sum_i dxi_i * (-(-g)_i) — reuse g list)
            pred_pose = 0.0
            for i in range(6):
                pred_pose = pred_pose + dxi[i] * (lam * dxi[i] - g[i])
            pred_flow = jnp.sum(
                jnp.where(
                    vmask > 0,
                    df0 * (lam * df0 - gf0) + df1 * (lam * df1 - gf1),
                    0.0,
                )
            )
            pred = 0.5 * (pred_pose + pred_flow)

            # ---- trial step ----
            dR, dt = _exp_se3_scalar(dxi)
            Rn, tn = _compose(dR, dt, R, t)
            f0n = f0 + df0
            f1n = f1 + df1
            F_new = objective(Rn, tn, f0n, f1n)
            gain = (F - F_new) / jnp.maximum(pred, 1e-20)
            accept = (F_new < F) & jnp.isfinite(F_new)
            lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * gain - 1.0) ** 3)
            done_n = done | (accept & (F - F_new < p.rel_tol * F + 1e-10)) | (lam > 1e8)

            sel = jnp.where(accept, 1.0, 0.0)
            pick = lambda a_new, a_old: sel * a_new + (1.0 - sel) * a_old
            out = [it + 1]
            for i in range(3):
                for j in range(3):
                    out.append(pick(Rn[i][j], R[i][j]))
            for i in range(3):
                out.append(pick(tn[i], t[i]))
            out.append(pick(f0n, f0))
            out.append(pick(f1n, f1))
            out.append(jnp.where(accept, F_new, F))
            out.append(jnp.where(accept, lam_acc, lam * nu))
            out.append(jnp.where(accept, 2.0, nu * 2.0))
            out.append(done_n)
            return tuple(out)

        def cond(state):
            return (state[0] < p.iters) & jnp.logical_not(state[-1])

        init = (
            jnp.int32(0),
            T0[0][0], T0[0][1], T0[0][2],
            T0[1][0], T0[1][1], T0[1][2],
            T0[2][0], T0[2][1], T0[2][2],
            t0[0], t0[1], t0[2],
            fm0, fm1,
            F0, lam0, jnp.float32(2.0), jnp.bool_(False),
        )
        fin = jax.lax.while_loop(cond, body, init)
        (it_f, R00, R01, R02, R10, R11, R12, R20, R21, R22,
         tx, ty, tz, f0, f1, F_f, _lam, _nu, _done) = fin
        Rf = [[R00, R01, R02], [R10, R11, R12], [R20, R21, R22]]
        tf = [tx, ty, tz]

        # ---- final chi2 / inliers / mean reproj ----
        y0, y1, y2 = transform(Rf, tf)
        iz = 1.0 / (y2 + 1e-9)
        r0 = (ob0 + f0) - (fx * y0 * iz + cx)
        r1 = (ob1 + f1) - (fy * y1 * iz + cy)
        chi2p = wp0 * (r0 * r0 + r1 * r1)
        inl = (vmask > 0) & (chi2p <= d2)
        n_in = jnp.sum(jnp.where(inl, 1.0, 0.0))
        mean_rp = jnp.sum(jnp.where(inl, jnp.sqrt(chi2p), 0.0)) / jnp.maximum(n_in, 1.0)

        fout_ref[0] = f0
        fout_ref[1] = f1
        chi2_ref[:] = chi2p

        # lane-select packing of the scalar results (vector where instead of
        # scalar scatters — friendlier to Mosaic)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

        def pack(pairs):
            row = jnp.zeros((1, _LANES), jnp.float32)
            for idx, val in pairs:
                row = jnp.where(lane == idx, val, row)
            return row

        t_pairs = []
        for i in range(3):
            for j in range(3):
                t_pairs.append((4 * i + j, Rf[i][j]))
            t_pairs.append((4 * i + 3, tf[i]))
        t_pairs.append((15, 1.0))
        tout_ref[:] = pack(t_pairs)
        stats_ref[:] = pack(
            [(0, n_in), (1, mean_rp), (2, F_f), (3, it_f.astype(jnp.float32))]
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("fx", "fy", "cx", "cy", "params", "interpret")
)
def solve_flow_ba_pallas(
    T_init: jnp.ndarray,
    Twl: jnp.ndarray,
    obs: jnp.ndarray,
    flow_meas: jnp.ndarray,
    depth: jnp.ndarray,
    valid: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    params: FlowBAParams = FlowBAParams(),
    interpret: bool = False,
    point_weight=None,
) -> FlowBAResult:
    """Drop-in Pallas replacement for ``flow_ba.solve_flow_ba``.

    Requires N (the padded point count) to be a multiple of 128; the
    pipeline's padded sizes satisfy this by construction (config.py).
    """
    p = params
    N = obs.shape[0]
    if N % _LANES != 0:
        raise ValueError(f"flow-BA Pallas kernel needs N % 128 == 0, got {N}")
    R = N // _LANES

    Xw = se3.transform(Twl, camera.backproject(obs, depth, fx, fy, cx, cy))
    valid = valid & (depth > 0)

    f32 = jnp.float32
    if point_weight is None:
        wpt = jnp.ones((N,), f32)
    else:
        wpt = jnp.broadcast_to(jnp.asarray(point_weight, f32), (N,))
    xw_pl = Xw.T.reshape(3, R, _LANES).astype(f32)
    obs_pl = obs.T.reshape(2, R, _LANES).astype(f32)
    fm_pl = flow_meas.T.reshape(2, R, _LANES).astype(f32)
    val_pl = valid.reshape(1, R, _LANES).astype(f32)
    wpt_pl = wpt.reshape(1, R, _LANES)
    tin = jnp.zeros((1, _LANES), f32).at[0, :16].set(T_init.reshape(16).astype(f32))

    kern = _make_kernel(p, float(fx), float(fy), float(cx), float(cy))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((1, _LANES), f32),
            jax.ShapeDtypeStruct((2, R, _LANES), f32),
            jax.ShapeDtypeStruct((R, _LANES), f32),
            jax.ShapeDtypeStruct((1, _LANES), f32),
        ),
        in_specs=[vspec] * 6,
        out_specs=(vspec, vspec, vspec, vspec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=p.iters * N * 120,
            bytes_accessed=(12 * N + 4 * _LANES) * 4,
            transcendentals=p.iters * 8,
        ),
    )
    # ERRATUM FENCE (header): a batch<=1 execution of this kernel under
    # lax.scan silently returns its init pose on the current toolchain,
    # and the dispatch layer cannot see whether a caller scans it.  The
    # kernel therefore ALWAYS runs with an internal instance batch of 2
    # (the verified-correct form, including under scan and under outer
    # vmaps, where the grid becomes 2K); instance 1 is a duplicate whose
    # outputs are discarded by the slice below.  The pallas_call is one
    # opaque custom call, so XLA cannot DCE the duplicate instance.  Cost:
    # one extra 17 us kernel instance per solve — noise next to the 27 ms
    # pair program (PERF.md).
    dup = lambda x: jnp.stack([x, x])
    tout, fout, chi2_pl, stats = jax.vmap(call)(
        dup(tin), dup(xw_pl), dup(obs_pl), dup(fm_pl), dup(val_pl), dup(wpt_pl)
    )
    tout, fout, chi2_pl, stats = tout[0], fout[0], chi2_pl[0], stats[0]

    T = tout[0, :16].reshape(4, 4)
    f = fout.reshape(2, N).T
    chi2 = chi2_pl.reshape(N)
    inliers = valid & (chi2 <= p.rp_thres)
    n_in = stats[0, 0].astype(jnp.int32)
    return FlowBAResult(
        T=T,
        flow=f,
        chi2=chi2,
        inliers=inliers,
        n_inliers=n_in,
        mean_reproj=stats[0, 1],
    )
