"""Closed-form rigid 3D-3D alignment (Horn / Arun SVD method), batched.

Used as the RANSAC minimal solver: the reference initializes object (and in
the commented path, camera) motion with OpenCV AP3P PnP
(src/Tracking.cc:4362-4367) and also ships its own Horn implementations
(``Find3DAffineTransform`` src/Tracking.cc:5219-5309, ``RanSacHorn``
:5123-5217).  On TPU, 3-point Horn over *both* frames' depth is the natural
minimal solver: thousands of 3x3 SVDs vmap onto the MXU/VPU with no
polynomial root-finding, and hypotheses are scored with the same 2D
reprojection gate the reference uses, so the inlier contract is unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp


def rigid_align(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray | None = None):
    """Least-squares R, t with dst ~= R @ src + t.

    src, dst: (..., N, 3); w: optional (..., N) weights.
    Returns (..., 4, 4).  Reflection-safe via the det sign correction.
    """
    if w is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / jnp.maximum(wsum, 1e-12)
    cs = jnp.sum(src * wn[..., None], axis=-2)
    cd = jnp.sum(dst * wn[..., None], axis=-2)
    s0 = src - cs[..., None, :]
    d0 = dst - cd[..., None, :]
    # covariance H = sum w * s0 d0^T  (3x3)
    H = jnp.einsum("...n,...ni,...nj->...ij", wn, s0, d0)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", jnp.swapaxes(Vt, -1, -2), jnp.swapaxes(U, -1, -2)))
    D = jnp.zeros_like(H).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(det)
    R = jnp.einsum("...ij,...jk,...kl->...il", jnp.swapaxes(Vt, -1, -2), D, jnp.swapaxes(U, -1, -2))
    t = cd - jnp.einsum("...ij,...j->...i", R, cs)
    T = jnp.zeros(R.shape[:-2] + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R).at[..., :3, 3].set(t).at[..., 3, 3].set(1.0)
    return T
