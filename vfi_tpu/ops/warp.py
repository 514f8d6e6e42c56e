"""Backward warping by optical flow (bilinear sampling).

Behavioral reference: the FlowWarper in src/models/slomo/slomo.py:265-286
(torch grid_sample with zero padding).  Two modes:

  * ``mode="pixel"`` (default, used for from-scratch training): sample
    directly in pixel space, ``out[y, x] = img[y + v, x + u]`` bilinearly,
    zero outside — no normalize/denormalize roundtrip.
  * ``mode="torch03"``: bit-faithful to the reference's FlowWarper, which
    normalizes with ``X = 2*(X/W - 0.5)`` and samples with grid_sample's
    align_corners=True convention (-1 -> pixel 0, +1 -> pixel W-1).  The
    roundtrip lands at ``(gx + u) * (W-1)/W`` — an extra (W-1)/W scale on
    grid and flow.  Use this when evaluating imported reference SloMo
    checkpoints so the flow fields mean the same thing they were trained as.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_warp(img: jax.Array, flow: jax.Array, mode: str = "pixel") -> jax.Array:
    """Bilinear backward warp.

    :param img: [B, H, W, C]
    :param flow: [B, H, W, 2] — (u, v) displacement in pixels
    :param mode: "pixel" (direct) or "torch03" (reference grid_sample parity)
    :return: [B, H, W, C]
    """
    B, H, W, C = img.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    px = gx[None] + flow[..., 0]
    py = gy[None] + flow[..., 1]
    if mode == "torch03":
        # slomo.py:279-284: X = 2*((gx+u)/W - .5) then align_corners=True
        # denorm px = (X+1)/2*(W-1) = (gx+u)*(W-1)/W
        px = px * ((W - 1) / W)
        py = py * ((H - 1) / H)
    elif mode != "pixel":
        raise ValueError(f"unknown flow_warp mode {mode!r}")

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
