"""Photometric verification of flow correspondences (patch ZNCC).

The reference trusts the precomputed .flo correspondences unconditionally
(src/Frame.cc:251-264 shifts keypoints by the flow with no verification);
bad flow — occlusions, motion boundaries, textureless road — enters the
camera solve and is only softened by the Huber kernel.  Measured on
kitti_sample, 10-20%% of static samples carry >10 px flow error in
coherent clusters that bias the pose (tools/diag_ego3.py).

This module adds an independent witness the reference lacks: compare a
small intensity patch around the point in the last frame with the patch
at its flow-shifted position in the current frame (zero-normalised cross
correlation).  Wrong flow ⇒ decorrelated patches ⇒ the point is dropped
before the solve.  On TPU this is a batched bilinear gather + small
reductions — a few microseconds for thousands of points.
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(gray: jnp.ndarray, uv: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(N, (2r+1)^2) bilinear intensity patches centred at ``uv`` (x, y)."""
    dy, dx = jnp.meshgrid(
        jnp.arange(-radius, radius + 1), jnp.arange(-radius, radius + 1), indexing="ij"
    )
    offs = jnp.stack([dx.reshape(-1), dy.reshape(-1)], -1).astype(gray.dtype)  # (P, 2)
    pos = uv[:, None, :] + offs[None, :, :]                                     # (N, P, 2)
    H, W = gray.shape
    x = jnp.clip(pos[..., 0], 0.0, W - 1.001)
    y = jnp.clip(pos[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = x - x0
    wy = y - y0
    v = (
        gray[y0, x0] * (1 - wx) * (1 - wy)
        + gray[y0, x0 + 1] * wx * (1 - wy)
        + gray[y0 + 1, x0] * (1 - wx) * wy
        + gray[y0 + 1, x0 + 1] * wx * wy
    )
    return v


def zncc(patch_a: jnp.ndarray, patch_b: jnp.ndarray) -> jnp.ndarray:
    """Zero-normalised cross-correlation along the last axis, in [-1, 1].

    Textureless patches (zero variance) score ~0 — treated as unverifiable
    rather than verified, which is the conservative choice for flow gating.
    """
    a = patch_a - patch_a.mean(-1, keepdims=True)
    b = patch_b - patch_b.mean(-1, keepdims=True)
    num = (a * b).sum(-1)
    den = jnp.sqrt((a * a).sum(-1) * (b * b).sum(-1)) + 1e-6
    return num / den
