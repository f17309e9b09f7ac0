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


def distort_normalized(xy: jnp.ndarray, k1, k2, p1, p2, k3=0.0) -> jnp.ndarray:
    """Apply Brown-Conrady distortion to normalized coords (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(
    uv: jnp.ndarray, fx, fy, cx, cy, k1, k2, p1, p2, k3=0.0, iters: int = 8
) -> jnp.ndarray:
    """Invert Brown-Conrady distortion on pixel keypoints (..., 2).

    The reference undistorts keypoint coordinates only (the image itself
    stays distorted) via cv::undistortPoints and re-applies K
    (Frame::UndistortKeyPoints, src/Frame.cc:787-811).  Same numerics
    here: normalize, fixed-point iterate x <- (xd - dt(x)) / radial(x)
    (the identical compensation loop OpenCV runs), re-project with K.
    Fully vectorised and jittable — a fixed ``iters``-step unrolled loop
    instead of data-dependent convergence tests.
    """
    xd = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
    x = xd
    for _ in range(iters):
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dtx = 2.0 * p1 * xx * yy + p2 * (r2 + 2.0 * xx * xx)
        dty = p1 * (r2 + 2.0 * yy * yy) + 2.0 * p2 * xx * yy
        x = jnp.stack(
            [(xd[..., 0] - dtx) / radial, (xd[..., 1] - dty) / radial], axis=-1
        )
    return jnp.stack(
        [x[..., 0] * fx + cx, x[..., 1] * fy + cy], axis=-1
    )
