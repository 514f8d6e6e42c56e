"""Spectral-normalized sliding-window video discriminator.

Behavioral reference: src/discriminators/SNDiscriminator.py (Miyato-style SN
via one-step power iteration; 4 stride-2 convs + linear head applied to every
``window_size``-frame window of the video, frames stacked on channels).

Functional re-design notes (SURVEY.md §5.2 — the reference's hidden state):
  * The power-iteration vector ``u`` lives in a flax variable collection
    ``"sn"`` and is threaded/updated explicitly (pass ``mutable=["sn"]`` in
    training steps).
  * The reference *persistently* divides the stored weight by sigma in place
    every forward (SNDiscriminator.py:67).  We use the standard SN
    formulation instead — normalize on the fly, leave the stored weight
    untouched — which is the textbook Miyato method and plays well with
    functional optimizers; after the reference's first few steps the two
    coincide (sigma -> 1).
  * The per-window Python loop (SNDiscriminator.py:149-154) is vectorized:
    all windows fold into the batch axis and the conv stack runs once.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import xavier_conv


def _l2normalize(v, eps=1e-12):
    return v / (jnp.sqrt(jnp.sum(v**2)) + eps)


class SpectralNorm(nn.Module):
    """Computes W / sigma_max(W) with persisted power-iteration state."""

    n_power_iterations: int = 1

    @nn.compact
    def __call__(self, w: jax.Array, train: bool) -> jax.Array:
        w_mat = w.reshape(-1, w.shape[-1]).T  # [out, in*k*k] (rows = out features)
        u_var = self.variable(
            "sn", "u", lambda: jax.random.normal(self.make_rng("params"), (w_mat.shape[0],))
        )
        u = u_var.value
        for _ in range(self.n_power_iterations):
            v = _l2normalize(u @ w_mat)
            u = _l2normalize(w_mat @ v)
        sigma = u @ w_mat @ v
        if train and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u)
        # keep the weight's compute dtype (power iteration runs f32)
        return w / jax.lax.stop_gradient(sigma).astype(w.dtype)


class SNConv(nn.Module):
    features: int
    kernel: int = 4
    stride: int = 2
    Ip: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_feat = x.shape[-1]
        w = self.param("kernel", xavier_conv, (self.kernel, self.kernel, in_feat, self.features))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        w = SpectralNorm(self.Ip, name="sn")(w, train)
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b


class SNDense(nn.Module):
    features: int
    Ip: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_feat = x.shape[-1]
        # Reference init for linear layers: uniform [0, 0.02] (util.py:199).
        w = self.param(
            "kernel", nn.initializers.uniform(scale=0.02), (in_feat, self.features)
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        w = SpectralNorm(self.Ip, name="sn")(w, train)
        return x @ w + b


class SNDiscriminator(nn.Module):
    """Sliding-window video discriminator.

    Input: video ``[B, Ttot, H, W, C]``; output: logits ``[B, Ttot - window + 1]``.
    """

    window_size: int
    df_dim: int = 64
    Ip: int = 1

    @nn.compact
    def __call__(self, video: jax.Array, train: bool = True) -> jax.Array:
        B, Ttot, H, W, C = video.shape
        w = self.window_size
        nw = Ttot - w + 1
        # All windows at once: [B, nw, w, H, W, C] -> [B*nw, H, W, w*C]
        windows = jnp.stack([video[:, s : s + w] for s in range(nw)], axis=1)
        x = windows.transpose(0, 1, 3, 4, 2, 5).reshape(B * nw, H, W, w * C)

        for i, mult in enumerate((1, 2, 4, 8)):
            x = SNConv(self.df_dim * mult, Ip=self.Ip, name=f"conv{i}")(x, train)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(B * nw, -1)
        # The reference hardcodes one power iteration for the linear head
        # regardless of Ip (SNDiscriminator.py:130).
        logits = SNDense(1, Ip=1, name="head")(x, train)
        return logits.reshape(B, nw)
