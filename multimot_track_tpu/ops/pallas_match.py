"""Fused descriptor-matching Pallas kernel.

The XLA path (ops/matching.py) materialises the (N, M) Hamming matrix in
HBM between the matmul and the top-k.  At reference scale (4000 x 4000)
that is a 64 MB round-trip — the op is HBM-bound, not MXU-bound.  This
kernel fuses distance computation, spatial gating and best/second-best
reduction per A-tile so only (N,)-shaped results ever leave VMEM:

  grid over A tiles; B (and its positions) stay resident in VMEM
  (256 x 4096 f32 = 4 MB); per tile: one MXU matmul -> (TILE, M) f32
  distances in VMEM -> masked min + argmin + second-best.

Mosaic notes (learned on v5e): the matmul must use the standard [1]x[0]
contraction with f32 operands (bf16 lhs is rejected by this toolchain),
and 1-D operands hit XLA/Mosaic layout mismatches — every vector is
carried as (n, 1).

Functional contract matches ``ops.matching.match_projected``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 128


def _kernel(desc_a_ref, uv_a_ref, va_ref, desc_bt_ref, uv_b_ref, vb_ref,
            r2_ref, best_ref, second_ref, idx_ref):
    a = desc_a_ref[:].astype(jnp.float32)              # (TILE_A, 256)
    bt = desc_bt_ref[:].astype(jnp.float32)            # (256, M)
    n_bits = a.shape[1]
    dots = jax.lax.dot_general(
        a, bt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                  # (TILE_A, M)
    D = (n_bits - dots) * 0.5

    # spatial gate: ||uv_pred - uv_b||^2 <= r^2
    du = uv_a_ref[:, 0:1] - uv_b_ref[:, 0:1].T
    dv = uv_a_ref[:, 1:2] - uv_b_ref[:, 1:2].T
    d2 = du * du + dv * dv
    ok = (d2 <= r2_ref[0, 0]) & (vb_ref[:, 0:1].T > 0) & (va_ref[:, 0:1] > 0)
    big = jnp.float32(1e9)
    D = jnp.where(ok, D, big)

    best = jnp.min(D, axis=1, keepdims=True)           # (TILE_A, 1)
    bidx = jnp.argmin(D, axis=1).astype(jnp.int32)[:, None]
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    D2 = jnp.where(cols == bidx, big, D)
    second = jnp.min(D2, axis=1, keepdims=True)

    best_ref[:] = best
    second_ref[:] = second
    idx_ref[:] = bidx


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_match_projected(
    desc_a: jnp.ndarray,   # (N, 256) int8 sign form
    uv_pred: jnp.ndarray,  # (N, 2)
    valid_a: jnp.ndarray,  # (N,)
    desc_b: jnp.ndarray,   # (M, 256)
    uv_b: jnp.ndarray,     # (M, 2)
    valid_b: jnp.ndarray,  # (M,)
    radius: float = 15.0,
    interpret: bool = False,
):
    """Returns (best, second, idx) arrays of shape (N,)."""
    N = desc_a.shape[0]
    assert N % TILE_A == 0, "pad N to a multiple of 128"
    grid = (N // TILE_A,)
    r2 = jnp.full((1, 1), radius * radius, jnp.float32)
    best, second, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_A, desc_a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full B^T descriptors
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full B positions
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full B valid (M, 1)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # r^2 scalar
        ],
        out_specs=[
            pl.BlockSpec((TILE_A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        desc_a.astype(jnp.float32),
        uv_pred.astype(jnp.float32),
        valid_a.astype(jnp.float32)[:, None],
        desc_b.astype(jnp.float32).T,
        uv_b.astype(jnp.float32),
        valid_b.astype(jnp.float32)[:, None],
        r2,
    )
    return best[:, 0], second[:, 0], idx[:, 0]
