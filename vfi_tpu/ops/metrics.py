"""Batched on-device PSNR / SSIM with scikit-image-compatible semantics.

The reference computes per-frame metrics on uint8 images with skimage's
``compare_psnr`` / ``compare_ssim`` in Python loops
(compute_quant_results.py:38-50, train.py:268-285) — a known CPU bottleneck
(SURVEY.md §3.1).  Here the whole [B, T] batch of frames is evaluated in one
XLA program.

Semantics matched to skimage defaults on uint8 inputs:
  * PSNR: data_range=255, MSE in float.
  * SSIM: 7x7 uniform filter, sample covariance (N/(N-1)), K1=.01, K2=.03,
    data_range=255, result averaged over the interior (valid-window) region;
    multichannel images average the per-channel scores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .image import inverse_transform


def quantize_uint8(frames: jax.Array) -> jax.Array:
    """[-1,1] float frames -> float array holding exact uint8 values [0,255].

    Matches predict.py's clamp -> scale -> round PNG write (predict.py:103-120)
    so on-device metrics agree with metrics computed from saved PNGs.
    """
    x = jnp.clip(inverse_transform(frames), 0.0, 1.0) * 255.0
    return jnp.round(x)


def psnr(pred_u8: jax.Array, gt_u8: jax.Array, clamp: float | None = None) -> jax.Array:
    """PSNR per image over [..., H, W, C] uint8-valued arrays -> [...]."""
    err = (pred_u8 - gt_u8).astype(jnp.float32)
    mse = jnp.mean(err**2, axis=(-3, -2, -1))
    p = 10.0 * jnp.log10(255.0**2 / jnp.maximum(mse, 1e-12))
    if clamp is not None:
        # summarize_quant_results.py:289 clamps infinite/huge PSNR to 100.
        p = jnp.minimum(p, clamp)
    return p


def _win_mean(x: jax.Array, win: int) -> jax.Array:
    """VALID-window uniform filter over the trailing two spatial dims of
    [..., H, W]."""
    ones = (1,) * (x.ndim - 2)
    s = lax.reduce_window(
        x, 0.0, lax.add, ones + (win, win), (1,) * x.ndim, "VALID"
    )
    return s / (win * win)


def ssim(pred_u8: jax.Array, gt_u8: jax.Array, win: int = 7) -> jax.Array:
    """SSIM per image over [..., H, W, C] uint8-valued arrays -> [...]."""
    x = jnp.moveaxis(pred_u8.astype(jnp.float32), -1, -3)  # [..., C, H, W]
    y = jnp.moveaxis(gt_u8.astype(jnp.float32), -1, -3)

    n = win * win
    cov_norm = n / (n - 1)  # sample covariance, skimage default
    ux, uy = _win_mean(x, win), _win_mean(y, win)
    uxx, uyy, uxy = _win_mean(x * x, win), _win_mean(y * y, win), _win_mean(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return jnp.mean(s, axis=(-3, -2, -1))  # mean over channels and valid pixels
