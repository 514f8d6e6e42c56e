"""Dynamic (K, T, F) support: pad-to-max layouts + masks.

The reference samples new (K, T, F) every iteration (environments.py:156-166)
— in JAX that would compile one program per combination (a "recompile storm",
SURVEY.md §7 hard part 3).  Instead, ONE program is compiled at
(max_K, max_T, max_F) and the sampled lengths enter as traced scalars:

  * preceding frames are RIGHT-aligned in a max_K buffer (so the content
    frame is always at index -1),
  * middle / following are LEFT-aligned in max_T / max_F buffers (so the
    first following frame is always at index 0),
  * every consumer (warm-up, blending weights, losses, discriminator windows)
    uses masks/gathers computed from the scalars.

All helpers are shape-static and fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_time(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather frames along axis 1 with a clamped [L_out] index vector."""
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    return jnp.take(x, idx, axis=1)


def pack_context(targets: jax.Array, K: jax.Array, T: jax.Array, F: jax.Array,
                 max_K: int, max_T: int, max_F: int):
    """Slice a max-length clip into padded (preceding, middle, following).

    Mirrors the reference's prefix slicing (train.py:111-115):
    preceding = targets[:, :K], middle = targets[:, K:K+T],
    following = targets[:, K+T:K+T+F] — but placed in fixed-size buffers:

      preceding: [B, max_K]  right-aligned (valid j >= max_K - K)
      middle:    [B, max_T]  left-aligned  (valid t <  T)
      following: [B, max_F]  left-aligned  (valid j <  F)
    """
    jK = jnp.arange(max_K)
    jT = jnp.arange(max_T)
    jF = jnp.arange(max_F)
    preceding = _gather_time(targets, jK - (max_K - K))
    middle = _gather_time(targets, K + jT)
    following = _gather_time(targets, K + T + jF)
    return preceding, middle, following


def middle_mask(T: jax.Array, max_T: int, dtype=jnp.float32) -> jax.Array:
    """[max_T] validity mask for left-aligned middle frames."""
    return (jnp.arange(max_T) < T).astype(dtype)


def dynamic_time_weights(T: jax.Array, max_T: int, dtype=jnp.float32) -> jax.Array:
    """w[t] = (t+1)/(T+1) for t < T, else 0 — the traced-scalar version of
    linspace(0,1,T+2)[1:-1] (tw_p_f.py:25)."""
    t = jnp.arange(max_T, dtype=dtype)
    w = (t + 1.0) / (T.astype(dtype) + 1.0)
    return w * middle_mask(T, max_T, dtype)


def reverse_middle(x_tmajor: jax.Array, T: jax.Array) -> jax.Array:
    """Re-order a time-major [max_T, ...] backward-rollout stack into natural
    middle order: position t <- rollout step (T-1-t) (reference tai.py:80-83,
    with runtime T)."""
    max_T = x_tmajor.shape[0]
    idx = jnp.clip(T - 1 - jnp.arange(max_T), 0, max_T - 1)
    return jnp.take(x_tmajor, idx, axis=0)


def masked_mean(x: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    """Mean of x over elements where mask==1 (mask broadcasts against x)."""
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis)
    count = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return total / count


def compact_video(preceding, pred, following, K, T, F):
    """Assemble [B, maxL] video of the real K+T+F frames (left-aligned,
    garbage-padded at the end) from the padded segments.

    Used to feed the sliding-window discriminator with a contiguous real
    sequence regardless of the sampled lengths.
    """
    max_K, max_T, max_F = preceding.shape[1], pred.shape[1], following.shape[1]
    video = jnp.concatenate([preceding, pred, following], axis=1)
    i = jnp.arange(max_K + max_T + max_F)
    idx = jnp.where(
        i < K,
        max_K - K + i,
        jnp.where(i < K + T, max_K + i - K, max_K + max_T + i - K - T),
    )
    return _gather_time(video, idx)


def dynamic_window_labels(K, T, F, max_L: int, window: int):
    """(labels, valid) for discriminator windows over a compact video.

    labels: 1 for windows fully inside the preceding or following context
    (environments.py:308-323); valid: 0 for windows touching padding.
    Shapes: [max_L - window + 1].
    """
    s = jnp.arange(max_L - window + 1)
    real_len = K + T + F
    valid = (s + window <= real_len).astype(jnp.float32)
    in_p = s + window <= K
    in_f = (s >= K + T) & (s + window <= real_len)
    labels = (in_p | in_f).astype(jnp.float32)
    return labels, valid
