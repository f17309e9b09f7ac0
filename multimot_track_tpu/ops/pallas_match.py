"""Fused descriptor-matching Pallas kernel.

The XLA path (ops/matching.py) materialises the (N, M) Hamming matrix in
HBM between the matmul and the top-k.  At reference scale (4000 x 4000)
that is a 64 MB round-trip — the op is HBM-bound, not MXU-bound.  This
kernel fuses distance computation, spatial gating and best/second-best
reduction per A-tile so only (N,)-shaped results ever leave VMEM:

  grid over A tiles; B (and its positions) stay resident in VMEM
  (4096 x 256 bf16 = 2 MB); per tile: one MXU matmul -> (TILE, M) f32
  distances in registers/VMEM -> masked min + argmin + second-best.

Functional contract matches ``ops.matching.match_projected``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 128


def _kernel(desc_a_ref, uv_a_ref, va_ref, desc_b_ref, uv_b_ref, vb_ref,
            r2_ref, best_ref, second_ref, idx_ref):
    a = desc_a_ref[:]                                  # (TILE_A, 256) bf16
    b = desc_b_ref[:]                                  # (M, 256) bf16
    n_bits = a.shape[1]
    dots = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                  # (TILE_A, M)
    D = (n_bits - dots) * 0.5

    # spatial gate: ||uv_pred - uv_b||^2 <= r^2
    du = uv_a_ref[:, 0:1] - uv_b_ref[:, 0][None, :]
    dv = uv_a_ref[:, 1:2] - uv_b_ref[:, 1][None, :]
    d2 = du * du + dv * dv
    ok = (d2 <= r2_ref[0, 0]) & (vb_ref[:][None, :] > 0) & (va_ref[:][:, None] > 0)
    big = jnp.float32(1e9)
    D = jnp.where(ok, D, big)

    best = jnp.min(D, axis=1)
    bidx = jnp.argmin(D, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    D2 = jnp.where(cols == bidx[:, None], big, D)
    second = jnp.min(D2, axis=1)

    best_ref[:] = best
    second_ref[:] = second
    idx_ref[:] = bidx


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
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
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_A, desc_a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full B descriptors
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full B positions
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full B valid
            pl.BlockSpec(memory_space=pltpu.SMEM),   # r^2 scalar
        ],
        out_specs=[
            pl.BlockSpec((TILE_A,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N,), jnp.float32),
            jax.ShapeDtypeStruct((N,), jnp.float32),
            jax.ShapeDtypeStruct((N,), jnp.int32),
        ],
        interpret=interpret,
    )(
        desc_a.astype(jnp.bfloat16),
        uv_pred.astype(jnp.float32),
        valid_a.astype(jnp.float32),
        desc_b.astype(jnp.bfloat16),
        uv_b.astype(jnp.float32),
        valid_b.astype(jnp.float32),
        r2,
    )
    return out
