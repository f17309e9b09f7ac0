"""Pinhole camera projection / unprojection, batched.

Replaces the reference's per-point loops (Frame::UnprojectStereoObject /
UnprojectStereoSift, src/Frame.cc:1064-1267; projection loops inlined in
src/Tracking.cc:1204-1216, 1723-1733) with vectorised jnp over (..., N)
point sets, so XLA fuses them into the surrounding solves.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def backproject(uv: jnp.ndarray, depth: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...,) -> camera-frame 3D (..., 3).

    x = (u - cx) z / fx ; y = (v - cy) z / fy  (src/Frame.cc:1127-1129).
    """
    x = (uv[..., 0] - cx) * depth / fx
    y = (uv[..., 1] - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def project(xyz: jnp.ndarray, fx, fy, cx, cy, eps: float = 1e-9) -> jnp.ndarray:
    """Camera-frame 3D (..., 3) -> pixels (..., 2).

    u = fx x/z + cx ; v = fy y/z + cy (src/Tracking.cc:1212-1214).
    """
    inv_z = 1.0 / (xyz[..., 2] + eps)
    u = fx * xyz[..., 0] * inv_z + cx
    v = fy * xyz[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1)


def disparity_png_to_depth(raw: jnp.ndarray, bf: float) -> jnp.ndarray:
    """KITTI uint16 disparity png -> metric depth.

    depth = bf / (png / 256)  (src/Tracking.cc:447-456).  Zero-disparity
    pixels map to +inf which downstream gates (> max depth) reject.
    """
    disp = raw.astype(jnp.float32) / 256.0
    return jnp.where(disp > 0, bf / jnp.maximum(disp, 1e-12), jnp.inf)


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample a (H, W) or (H, W, C) image at float pixel coords (..., 2)."""
    H, W = img.shape[0], img.shape[1]
    u = jnp.clip(uv[..., 0], 0.0, W - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = (u - u0).astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) else (u - u0)
    dv = (v - v0) if not jnp.issubdtype(img.dtype, jnp.floating) else (v - v0).astype(img.dtype)
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    if img.ndim == 3:
        du = du[..., None]
        dv = dv[..., None]
    return (
        i00 * (1 - du) * (1 - dv)
        + i01 * du * (1 - dv)
        + i10 * (1 - du) * dv
        + i11 * du * dv
    )


def nearest_sample(img: jnp.ndarray, uv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Round-to-nearest sample, replicating the reference's
    ``imDepth.at<float>(round(v), round(u))`` with its in-bounds test
    (src/Tracking.cc:556-566).  Returns (values, in_bounds_mask)."""
    H, W = img.shape[0], img.shape[1]
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    inb = (u > 0) & (u < W) & (v > 0) & (v < H)
    uc = jnp.clip(u, 0, W - 1)
    vc = jnp.clip(v, 0, H - 1)
    return img[vc, uc], inb
