"""Conv-transformer building blocks for the SCT model family.

Behavioral reference: src/models/self_attention/submodules.py.  The design:
queries/keys are *spatially pooled* vectors of the value maps; values are full
conv maps; attention mixes whole frames (submodules.py:10-54).

TPU-first deviations (documented, deliberate):
  * The reference normalizes with BatchNorm3d used as a pseudo-layernorm
    (submodules.py:194-205).  Batch statistics over the time axis break the
    causality of incremental decoding and carry mutable state; we use
    LayerNorm over the feature axis — functional, causal-safe, jit-friendly.
  * Multi-head attention computes all heads in one einsum instead of a
    per-head Python loop (submodules.py:114-117).
  * The reference builds its encoder/decoder stacks with ``d_ff = d_v``,
    silently ignoring the d_ff argument (submodules.py:387,429); we keep that
    behavior for architecture parity.

Sequences are [B, T, H, W, C] (NHWC per frame).
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv

NEG_INF = 1e10


def positional_encoding(t: jax.Array, d_v: int) -> jax.Array:
    """Sinusoidal PE over (possibly fractional) time steps [B, T] -> [B, T, d_v].

    Interleaved sin/cos with denominators 10000^(2i/d_v)
    (reference submodules.py:303-336; time steps are scaled floats).
    """
    i = jnp.arange(d_v // 2, dtype=t.dtype)
    denom = jnp.power(10000.0, 2.0 * i / d_v)
    wave = t[..., None] / denom  # [B, T, d_v/2]
    pe = jnp.stack([jnp.sin(wave), jnp.cos(wave)], axis=-1)
    return pe.reshape(*t.shape, d_v)


def add_spatial_pe(x: jax.Array, t: jax.Array) -> jax.Array:
    """Broadcast the PE of each frame over its H, W (submodules.py:339-365)."""
    pe = positional_encoding(t, x.shape[-1])
    return x + pe[:, :, None, None, :]


class ConvMultiHeadAttention(nn.Module):
    """MHA over conv-map values with vector queries/keys (submodules.py:57-126)."""

    num_heads: int
    d_qk: int
    d_v: int

    @nn.compact
    def __call__(self, v, k, q, prod_mask=None):
        """
        :param v: value maps [B, T_i, H, W, d_v]
        :param k: key vectors [B, T_i, d_qk]
        :param q: query vectors [B, T_o, d_qk]
        :param prod_mask: [B, T_o, T_i] — 0 forbids attention
        :return: [B, T_o, H, W, d_v]
        """
        B, T_i, H, W, _ = v.shape
        nh, dq, dv = self.num_heads, self.d_qk, self.d_v

        proj_q = nn.Dense(nh * dq, name="q")(q).reshape(B, -1, nh, dq)
        proj_k = nn.Dense(nh * dq, name="k")(k).reshape(B, T_i, nh, dq)
        v_flat = v.reshape(B * T_i, H, W, dv)
        proj_v = Conv(nh * dv, 3, name="v")(v_flat).reshape(B, T_i, H, W, nh, dv)

        logits = jnp.einsum("bond,bind->bnoi", proj_q, proj_k) / jnp.sqrt(float(dq))
        if prod_mask is not None:
            logits = jnp.where(prod_mask[:, None] == 0, -NEG_INF, logits)
        weights = jax.nn.softmax(logits, axis=-1)  # [B, nh, T_o, T_i]

        # One einsum across all heads: [B,nh,T_o,T_i] x [B,T_i,H,W,nh,dv]
        attended = jnp.einsum("bnoi,bixynd->boxynd", weights, proj_v)
        T_o = attended.shape[1]
        concat = attended.reshape(B * T_o, H, W, nh * dv)
        out = nn.Conv(dv, (1, 1), name="proj")(concat)
        return out.reshape(B, T_o, H, W, dv)


class EncoderBlock(nn.Module):
    """Self-attention + conv feed-forward with residuals (submodules.py:129-191)."""

    num_heads: int
    d_v: int

    @nn.compact
    def __call__(self, v, seq_mask=None):
        B, T_i, H, W, dv = v.shape
        if seq_mask is None:
            seq_mask = jnp.ones((B, T_i), v.dtype)
        masked_v = v * seq_mask[:, :, None, None, None]
        q = masked_v.mean(axis=(2, 3))  # [B, T_i, d_v]
        prod_mask = jnp.broadcast_to(seq_mask[:, None, :], (B, T_i, T_i))
        mha = ConvMultiHeadAttention(self.num_heads, dv, dv, name="mha")(v, q, q, prod_mask)
        x = nn.LayerNorm(name="norm1")(masked_v + mha)
        ff = Conv(dv, 3, name="ff2")(nn.relu(Conv(dv, 3, name="ff1")(x.reshape(B * T_i, H, W, dv)))).reshape(x.shape)
        return nn.LayerNorm(name="norm2")(x + ff)


class DecoderBlock(nn.Module):
    """Masked self-attention + cross-attention + feed-forward
    (submodules.py:208-300)."""

    num_heads: int
    d_v: int

    @nn.compact
    def __call__(self, q_dec, kv_dec, kv_enc, enc_seq_mask=None, prod_mask=None):
        B, T_o, H, W, dv = q_dec.shape
        T_i = kv_enc.shape[1]
        if enc_seq_mask is None:
            enc_seq_mask = jnp.ones((B, T_i), q_dec.dtype)
        enc_prod_mask = jnp.broadcast_to(enc_seq_mask[:, None, :], (B, T_o, T_i))

        q_vec = q_dec.mean(axis=(2, 3))
        kv_vec = kv_dec.mean(axis=(2, 3))
        self_out = ConvMultiHeadAttention(self.num_heads, dv, dv, name="self_mha")(
            kv_dec, kv_vec, q_vec, prod_mask
        )
        x = nn.LayerNorm(name="norm1")(self_out + q_dec)

        enc_vec = kv_enc.mean(axis=(2, 3))
        x_vec = x.mean(axis=(2, 3))
        cross = ConvMultiHeadAttention(self.num_heads, dv, dv, name="cross_mha")(
            kv_enc, enc_vec, x_vec, enc_prod_mask
        )
        x = nn.LayerNorm(name="norm2")(cross + x)
        ff = Conv(dv, 3, name="ff2")(nn.relu(Conv(dv, 3, name="ff1")(x.reshape(B * T_o, H, W, dv)))).reshape(x.shape)
        return nn.LayerNorm(name="norm3")(x + ff)


class ConvTransformerEncoder(nn.Module):
    """Stack of encoder blocks; returns the top rep, or all reps when
    ``return_all`` (the skip-connection variant, submodules.py:477-497)."""

    num_blocks: int
    num_heads: int
    d_v: int
    return_all: bool = False

    @nn.compact
    def __call__(self, x, input_mask, time_steps):
        x = add_spatial_pe(x, time_steps)
        reps = []
        for n in range(self.num_blocks):
            x = EncoderBlock(self.num_heads, self.d_v, name=f"block{n}")(x, input_mask)
            reps.append(x)
        return reps if self.return_all else reps[-1]


class ConvTransformerDecoder(nn.Module):
    """Autoregressive decoder with per-level growing KV caches
    (submodules.py:410-474).

    ``enc_attend``: which encoder rep each decoder level cross-attends to —
      "top":  plain decoder (enc_output is a single rep)
      "skip": level i attends encoder level n-i (ConvSkipConTransformerDecoder)
      "same": level i attends encoder level i (ConvHiddenTransformerDecoder;
              the reference's incremental loop used mismatched levels —
              submodules.py:595-597 — we follow the documented intent)
    """

    num_blocks: int
    num_heads: int
    d_v: int
    enc_attend: str = "top"

    def _enc_for(self, enc_output, n_block):
        if self.enc_attend == "top":
            return enc_output
        if self.enc_attend == "skip":
            return enc_output[-n_block - 1]
        return enc_output[n_block]

    @nn.compact
    def __call__(self, enc_output, enc_seq_mask, init_dec_input, time_steps_full, prod_mask_full):
        T_o_old = init_dec_input.shape[1]
        T_o = time_steps_full.shape[1]

        blocks = [DecoderBlock(self.num_heads, self.d_v, name=f"block{n}") for n in range(self.num_blocks)]

        mod_init = add_spatial_pe(init_dec_input, time_steps_full[:, :T_o_old])
        reps: List[jax.Array] = [mod_init]
        init_mask = prod_mask_full[:, :T_o_old, :T_o_old]
        for n, blk in enumerate(blocks):
            reps.append(blk(reps[n], reps[n], self._enc_for(enc_output, n), enc_seq_mask, init_mask))

        # Incremental decoding: feed the top level's newest rep back in as the
        # next level-0 input; every level's KV cache grows by one per step.
        for t in range(T_o_old, T_o):
            new_in = reps[-1][:, -1:]
            new_mod = add_spatial_pe(new_in, time_steps_full[:, t : t + 1])
            step_mask = prod_mask_full[:, t : t + 1, : t + 1]
            reps[0] = jnp.concatenate([reps[0], new_mod], axis=1)
            x = new_mod
            for n, blk in enumerate(blocks):
                x = blk(x, reps[n], self._enc_for(enc_output, n), enc_seq_mask, step_mask)
                reps[n + 1] = jnp.concatenate([reps[n + 1], x], axis=1)

        return reps[-1]
