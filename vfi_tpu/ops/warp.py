"""Backward warping by optical flow (bilinear sampling).

Behavioral reference: the FlowWarper in src/models/slomo/slomo.py:265-286
(torch grid_sample with zero padding).  We sample directly in pixel space:
``out[y, x] = img[y + v, x + u]`` bilinearly, zero outside — avoiding the
reference's normalize/denormalize roundtrip (which introduced an extra
(W-1)/W scale on the flow via align_corners semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear backward warp.

    :param img: [B, H, W, C]
    :param flow: [B, H, W, 2] — (u, v) displacement in pixels
    :return: [B, H, W, C]
    """
    B, H, W, C = img.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    px = gx[None] + flow[..., 0]
    py = gy[None] + flow[..., 1]

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat_idx = yc * W + xc  # [B, H, W]
        flat_img = img.reshape(B, H * W, C)
        vals = jnp.take_along_axis(flat_img, flat_idx.reshape(B, H * W, 1), axis=1)
        return vals.reshape(B, H, W, C) * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
