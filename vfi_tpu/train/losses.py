"""Training losses.

References: src/losses/losses.py (GDL), src/environments/environments.py
(loss compositions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def gdl_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Image gradient-difference loss (Mathieu et al. 2016).

    L1 between spatial forward-differences of pred and target, averaged.
    Operates on NHWC (or any [..., H, W, C]); matches the reference's
    crop-then-sum construction (losses.py:17-45) which evaluates on the
    interior (H-1) x (W-1) grid.
    """
    pw = pred[..., :, :-1, :] - pred[..., :, 1:, :]
    ph = pred[..., 1:, :, :] - pred[..., :-1, :, :]
    tw = target[..., :, :-1, :] - target[..., :, 1:, :]
    th = target[..., 1:, :, :] - target[..., :-1, :, :]
    w_term = jnp.abs(pw - tw)[..., 1:, :, :]  # [..., H-1, W-1, C]
    h_term = jnp.abs(ph - th)[..., :, 1:, :]
    return jnp.mean(w_term + h_term)


def l2_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


def disc_window_labels(K: int, T: int, F: int, window: int) -> jax.Array:
    """Ground-truth labels for the sliding-window discriminator on a *fake*
    video: windows lying fully inside the preceding or following context are
    'real' (1), all windows touching generated frames are 'fake' (0).

    Reference: environments.py:308-323.  Returns ``[K+T+F-window+1]``.
    """
    n = K + T + F - window + 1
    idx = jnp.arange(n)
    fully_preceding = idx + window <= K  # window [idx, idx+window) within [0, K)
    fully_following = idx >= K + T
    return (fully_preceding | fully_following).astype(jnp.float32)
