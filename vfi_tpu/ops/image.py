"""Image-space primitives shared across models (NHWC, values in [-1, 1]).

Behavioral reference: src/util/util.py:22-41 (value transforms, grayscale) and
src/models/mcnet/mcnet.py:240-256 (fixed unpooling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# The reference decodes videos as BGR and converts to gray with BGR-ordered
# luma weights (src/util/util.py:30-41).  We keep channel order BGR in the
# data pipeline so the same weights apply: gray = .114*B + .587*G + .2989*R.
_BGR_LUMA = (0.1140, 0.5870, 0.2989)


def inverse_transform(images: jax.Array) -> jax.Array:
    """[-1, 1] -> [0, 1]."""
    return (images + 1.0) / 2.0


def fore_transform(images: jax.Array) -> jax.Array:
    """[0, 1] -> [-1, 1]."""
    return images * 2.0 - 1.0


def bgr_to_gray(images: jax.Array) -> jax.Array:
    """Luma conversion over the trailing channel axis; keeps a 1-channel dim.

    Works for any leading shape: [..., H, W, 3] -> [..., H, W, 1].
    """
    w = jnp.asarray(_BGR_LUMA, images.dtype)
    return jnp.einsum("...c,c->...", images, w)[..., None]


def to_gray_frames(frames: jax.Array) -> jax.Array:
    """Map [-1,1] frames to [0,1] grayscale, as MC-Net's difference-frame input
    expects (src/models/mcnet/mcnet.py:336-337)."""
    f01 = inverse_transform(frames)
    if frames.shape[-1] > 1:
        return bgr_to_gray(f01)
    return f01


def fixed_unpooling(x: jax.Array) -> jax.Array:
    """Zero-stuffing 2x spatial upsample: out[2y, 2x] = in[y, x], zeros elsewhere.

    NHWC equivalent of the reference's grid-spreading unpool
    (src/models/mcnet/mcnet.py:240-256).
    """
    B, H, W, C = x.shape
    z = jnp.zeros_like(x)
    # interleave along W: [B,H,W,2,C] -> [B,H,2W,C]
    xw = jnp.stack([x, z], axis=3).reshape(B, H, 2 * W, C)
    zw = jnp.zeros_like(xw)
    # interleave along H
    return jnp.stack([xw, zw], axis=2).reshape(B, 2 * H, 2 * W, C)


def upsample2x_bilinear(x: jax.Array, align_corners: bool = False) -> jax.Array:
    """Bilinear 2x spatial upsample.

    ``align_corners=False`` — half-pixel centers (jax.image.resize semantics).
    ``align_corners=True``  — corner-aligned sampling, bit-matching the
    reference's torch-0.3 ``nn.Upsample(scale_factor=2, mode='bilinear')``
    (src/models/tai/tai.py:281-285, 340-346); required for numerical parity
    with imported reference checkpoints.  Implemented as two banded-matrix
    contractions (constant interpolation matrices -> MXU matmuls under XLA).
    """
    B, H, W, C = x.shape
    if not align_corners:
        return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")
    rh = _align_corners_matrix(H, x.dtype)
    rw = _align_corners_matrix(W, x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", rh, x)
    return jnp.einsum("ow,bhwc->bhoc", rw, x)


@functools.lru_cache(maxsize=None)
def _align_corners_matrix_np(n: int):
    """[2n, n] linear-interpolation matrix with corner-aligned sample points:
    out coord i maps to input coord i*(n-1)/(2n-1)."""
    out = np.zeros((2 * n, n), np.float64)
    if n == 1:
        out[:, 0] = 1.0
        return out
    pos = np.arange(2 * n) * (n - 1) / (2 * n - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    w = pos - lo
    out[np.arange(2 * n), lo] += 1.0 - w
    out[np.arange(2 * n), hi] += w
    return out


def _align_corners_matrix(n: int, dtype) -> jax.Array:
    return jnp.asarray(_align_corners_matrix_np(n), dtype)


def frames_from_uint8(u8_bgr: jax.Array, c_dim: int, dtype=jnp.float32) -> jax.Array:
    """Device-side normalization: uint8 BGR frames -> [-1,1] float (+ gray).

    Lets the host ship uint8 batches (4x less H2D traffic than f32); the
    [0,255] -> [-1,1] map and the BGR-luma grayscale conversion run on device.
    Matches the dataset's host-side pipeline bit-for-bit up to float rounding.
    """
    x = u8_bgr.astype(dtype) / 255.0
    if c_dim == 1:
        x = bgr_to_gray(x)
    return x * 2.0 - 1.0


def time_weights(T: int, dtype=jnp.float32) -> jax.Array:
    """The reference's per-middle-frame blend weights: linspace(0,1,T+2)[1:-1].

    w[t] is the weight of the *following*-derived stream at middle step t
    (src/models/tw_p_f/tw_p_f.py:25, tai.py:90).
    """
    return jnp.linspace(0.0, 1.0, T + 2, dtype=dtype)[1:-1]
