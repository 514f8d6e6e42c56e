"""SCT: the sequential conv-transformer fill-in family (8 registered variants).

Behavioral reference: src/models/self_attention/self_attention.py.  Shared
machinery: a 4-stage conv frame encoder/decoder applied per frame, a conv
transformer encoder over the context frames (time steps scaled into
[0,1) for preceding and [2,3) for following frames), and an autoregressive
conv-transformer decoder over middle time steps scaled into [1,2).

Variants:
  * Forward — earliest-to-latest generation with a causal mask
    (self_attention.py:132-255, incl. teacher-forced ``forward_train``)
  * Inward — ends-inward generation order, outputs re-sorted (:258-327)
  * Random — random order, re-sorted (:330-397)
  * RandomB — random order; generated frames are *re-encoded* and appended to
    the transformer-encoder input each step (:400-506)
  * RandomC — RandomB + encoder/decoder skip connections (:509-622)
  * RandomD — RandomC with same-level ("hidden") attention (:625-634)
  * Bypass — Forward with extra convs instead of frame-codec skips (:637-682)
  * FrameEncDecBN — Forward with a normalized frame codec (:685-778; we use
    GroupNorm instead of BatchNorm2d — functional, batch-size independent)

Random order sampling uses the flax RNG collection ``"sample"`` (pass
``rngs={'sample': key}`` to ``apply``); the reference used global torch RNG.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Conv
from ..nn.transformer import ConvTransformerDecoder, ConvTransformerEncoder


def _nearest_up2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")


class FrameEncoder(nn.Module):
    """4-stage per-frame conv pyramid -> d_v maps at H/8 (self_attention.py:30-57)."""

    d_v: int
    use_norm: bool = False

    def _norm(self, x, name):
        if self.use_norm:
            x = nn.GroupNorm(num_groups=min(8, x.shape[-1]), name=name)(x)
        return x

    @nn.compact
    def __call__(self, frames):
        """[B, N, H, W, C] -> list of 4 reps [B, N, H/2^s, W/2^s, d]"""
        B, N, H, W, C = frames.shape
        x = frames.reshape(B * N, H, W, C)
        d = self.d_v
        reps = []
        # stage 0: conv-relu-conv (no trailing relu)
        x = self._norm(Conv(d // 8, 3, name="e0a")(x), "n0a")
        x = self._norm(Conv(d // 8, 3, name="e0b")(nn.relu(x)), "n0b")
        reps.append(x)
        for s, width in enumerate((d // 4, d // 2, d)):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = self._norm(Conv(width, 3, name=f"e{s + 1}a")(nn.relu(x)), f"n{s + 1}a")
            x = self._norm(Conv(width, 3, name=f"e{s + 1}b")(nn.relu(x)), f"n{s + 1}b")
            reps.append(x)
        return [r.reshape(B, N, *r.shape[1:]) for r in reps]


class FrameDecoder(nn.Module):
    """4-stage conv decoder with nearest-neighbor upsampling
    (self_attention.py:59-88); inputs are combined with the per-stage frame
    encoder outputs by the caller."""

    d_v: int
    c_dim: int
    use_norm: bool = False

    def _norm(self, x, name):
        if self.use_norm:
            x = nn.GroupNorm(num_groups=min(8, x.shape[-1]), name=name)(x)
        return x

    @nn.compact
    def __call__(self, x_flat: jax.Array, stage: int) -> jax.Array:
        d = self.d_v
        if stage == 0:
            x = self._norm(Conv(d, 3, name="d0a")(x_flat), "n0a")
            x = self._norm(Conv(d // 2, 3, name="d0b")(nn.relu(x)), "n0b")
            return _nearest_up2(x)
        if stage < 3:
            width_in = d // (2**stage)
            x = self._norm(Conv(width_in, 3, name=f"d{stage}a")(nn.relu(x_flat)), f"n{stage}a")
            x = self._norm(Conv(width_in // 2, 3, name=f"d{stage}b")(nn.relu(x)), f"n{stage}b")
            return _nearest_up2(x)
        x = self._norm(Conv(d // 8, 3, name="d3a")(nn.relu(x_flat)), "n3a")
        return jnp.tanh(Conv(self.c_dim, 3, name="d3b")(nn.relu(x)))


class BaseSCTFillInModel(nn.Module):
    """Shared frame codec + transformer encoder/decoder wiring."""

    c_dim: int
    num_blocks: int = 2
    num_heads: int = 3
    d_v: int = 256
    d_ff: int = 2048  # accepted for registry parity; blocks use d_v (see nn/transformer.py)
    frame_norm: bool = False
    enc_return_all: bool = False
    dec_enc_attend: str = "top"

    def setup(self):
        self.frame_encoder = FrameEncoder(self.d_v, self.frame_norm)
        self.frame_decoder = FrameDecoder(self.d_v, self.c_dim, self.frame_norm)
        self.encoder = ConvTransformerEncoder(
            self.num_blocks, self.num_heads, self.d_v, return_all=self.enc_return_all
        )
        self.decoder = ConvTransformerDecoder(
            self.num_blocks, self.num_heads, self.d_v, enc_attend=self.dec_enc_attend
        )

    # -- frame codec ---------------------------------------------------------
    def encode_frames(self, frames):
        return self.frame_encoder(frames)

    def decode_frames(self, dec_out, frame_reps):
        """Decode transformer outputs into frames, adding the per-stage skip
        connections from the *seed* frame's encoder pyramid
        (self_attention.py:109-125; seed reps broadcast over T)."""
        B, T = dec_out.shape[:2]
        x = dec_out
        for stage in range(4):
            skip = frame_reps[-stage - 1]
            if skip.shape[1] == 1:  # seed-frame pyramid broadcast over T
                skip = jnp.broadcast_to(skip, (B, T, *skip.shape[2:]))
            comb = x + skip
            flat = comb.reshape(B * T, *comb.shape[2:])
            out = self.frame_decoder(flat, stage)
            x = out.reshape(B, T, *out.shape[1:])
        return x

    # -- shared context encoding --------------------------------------------
    def _context_times(self, max_K, max_F, dt, lengths):
        """(t_pre, t_fol, mask_pre, mask_fol) for the padded context buffers."""
        if lengths is None:
            t_pre = jnp.arange(max_K, dtype=dt) / max_K
            t_fol = jnp.arange(max_F, dtype=dt) / max_F + 2.0
            return t_pre, t_fol, jnp.ones((max_K,), dt), jnp.ones((max_F,), dt)
        K, _, F = lengths
        Kf, Ff = jnp.asarray(K, dt), jnp.asarray(F, dt)
        iK = jnp.arange(max_K)
        mask_pre = (iK >= max_K - K).astype(dt)
        t_pre = (iK.astype(dt) - (max_K - Kf)) / Kf * mask_pre
        iF = jnp.arange(max_F)
        mask_fol = (iF < F).astype(dt)
        t_fol = (iF.astype(dt) / Ff + 2.0) * mask_fol
        return t_pre, t_fol, mask_pre, mask_fol

    def _context(self, preceding, following, lengths=None):
        """Encode the K+F context frames.

        With ``lengths=(K, T, F)`` (traced scalars), ``preceding`` is a
        RIGHT-aligned max_K buffer and ``following`` a LEFT-aligned max_F
        buffer (ops/dynamic.pack_context); padded positions are excluded via
        the encoder sequence mask and their time steps zeroed."""
        B, max_K = preceding.shape[:2]
        max_F = following.shape[1]
        dt = preceding.dtype
        t_pre, t_fol, mask_pre, mask_fol = self._context_times(max_K, max_F, dt, lengths)
        enc_mask = jnp.broadcast_to(
            jnp.concatenate([mask_pre, mask_fol])[None], (B, max_K + max_F)
        )
        enc_time = jnp.broadcast_to(jnp.concatenate([t_pre, t_fol])[None], (B, max_K + max_F))
        frames = jnp.concatenate([preceding, following], axis=1)
        reps = self.encode_frames(frames)
        enc_out = self.encoder(reps[-1], enc_mask, enc_time)
        return enc_out, enc_mask

    def _decode_with_times(self, T, preceding, enc_out, enc_mask, dec_times):
        """Run the transformer decoder seeded by the last preceding frame, then
        frame-decode with the seed's pyramid."""
        B = preceding.shape[0]
        seed_reps = self.encode_frames(preceding[:, -1:])
        tril = jnp.tril(jnp.ones((T, T), preceding.dtype))
        prod_mask = jnp.broadcast_to(tril[None], (B, T, T))
        dec_out = self.decoder(enc_out, enc_mask, seed_reps[-1], dec_times, prod_mask)
        return self.decode_frames(dec_out, seed_reps)

    def _resort(self, pred_permuted, dec_times):
        """Re-sort generated frames into natural time order via argsort of the
        (scaled) generation times (self_attention.py:320-323)."""
        order = jnp.argsort(dec_times, axis=1)  # [B, T]
        return jnp.take_along_axis(pred_permuted, order[:, :, None, None, None], axis=1)


class SCTSkipConScaledTForwardFillInModel(BaseSCTFillInModel):
    """Earliest-to-latest autoregressive generation (self_attention.py:132-191).

    Supports dynamic (K, T, F) via ``lengths=(K, T, F)`` traced scalars on
    pad-to-max buffers: generation times use the runtime T, padded context is
    attention-masked, and outputs at t >= T are garbage the caller masks
    (train/dynamic_env.DynamicSCTEnvironment) — positions t < T never attend
    them thanks to the causal mask, so valid outputs equal the static path.
    """

    def _dec_times(self, max_T, B, dt, lengths):
        Tf = jnp.asarray(lengths[1], dt) if lengths is not None else max_T
        return jnp.broadcast_to((jnp.arange(max_T, dtype=dt) / Tf + 1.0)[None], (B, max_T))

    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        B = preceding.shape[0]
        enc_out, enc_mask = self._context(preceding, following, lengths)
        dec_times = self._dec_times(T, B, preceding.dtype, lengths)
        pred = self._decode_with_times(T, preceding, enc_out, enc_mask, dec_times)
        return {"pred": pred}

    def forward_train(self, T: int, preceding, following, gt_middle, lengths=None) -> Dict[str, Any]:
        """Teacher-forced pass: decoder inputs are the shifted GT middle frames
        (self_attention.py:194-255).  With ``lengths``, gt_middle is a
        left-aligned max_T buffer, so the shifted inputs are correct at every
        valid step for any runtime T."""
        B = preceding.shape[0]
        enc_out, enc_mask = self._context(preceding, following, lengths)
        if T > 1:
            dec_in_frames = jnp.concatenate([preceding[:, -1:], gt_middle[:, : T - 1]], axis=1)
        else:
            dec_in_frames = preceding[:, -1:]
        dec_reps = self.encode_frames(dec_in_frames)
        dec_times = self._dec_times(T, B, preceding.dtype, lengths)
        tril = jnp.tril(jnp.ones((T, T), preceding.dtype))
        prod_mask = jnp.broadcast_to(tril[None], (B, T, T))
        dec_out = self.decoder(enc_out, enc_mask, dec_reps[-1], dec_times, prod_mask)
        pred = self.decode_frames(dec_out, dec_reps)
        return {"pred": pred}


class SCTSkipConScaledTInwardFillInModel(BaseSCTFillInModel):
    """Ends-inward generation order: first, last, second, second-to-last, ...
    (self_attention.py:258-327).  Dynamic lengths supported: the order values
    are a closed form of the step index (even s -> s/2, odd s -> T-(s+1)/2),
    so a traced T just changes the values; garbage steps (s >= T) generate
    after every valid step (causal-safe) and resort to the tail."""

    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        B = preceding.shape[0]
        dt = preceding.dtype
        enc_out, enc_mask = self._context(preceding, following, lengths)
        s = jnp.arange(T)
        Tr = jnp.asarray(lengths[1] if lengths is not None else T, dt)
        order_times = jnp.where(s % 2 == 0, s // 2, Tr - (s + 1) // 2).astype(dt)
        dec_times = jnp.broadcast_to((order_times / Tr + 1.0)[None], (B, T))
        if lengths is not None:
            # garbage steps (s >= runtime T) must resort AFTER the valid ones
            dec_times = jnp.where((s < lengths[1])[None], dec_times, 1e6 + s[None].astype(dt))
        pred_perm = self._decode_with_times(T, preceding, enc_out, enc_mask, dec_times)
        return {"pred": self._resort(pred_perm, dec_times)}


class SCTSkipConScaledTRandomFillInModel(BaseSCTFillInModel):
    """Random generation order, re-sorted afterwards (self_attention.py:330-397).

    Dynamic lengths: a uniform permutation of the runtime-T valid steps is
    drawn by rank-ordering random uniforms over the valid positions (invalid
    positions rank last), so shapes stay static."""

    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        B = preceding.shape[0]
        dt = preceding.dtype
        enc_out, enc_mask = self._context(preceding, following, lengths)
        rng = self.make_rng("sample")
        if lengths is None:
            perms = jax.vmap(lambda k: jax.random.permutation(k, T))(jax.random.split(rng, B))
            dec_times = perms.astype(dt) / T + 1.0
        else:
            Tr = jnp.asarray(lengths[1], dt)
            s = jnp.arange(T)
            r = jax.random.uniform(rng, (B, T))
            r = jnp.where((s < lengths[1])[None], r, jnp.inf)
            # rank of each valid step among valid steps = a uniform permutation
            ranks = jnp.argsort(jnp.argsort(r, axis=1), axis=1).astype(dt)
            dec_times = ranks / Tr + 1.0
            dec_times = jnp.where((s < lengths[1])[None], dec_times, 1e6 + s[None].astype(dt))
        pred_perm = self._decode_with_times(T, preceding, enc_out, enc_mask, dec_times)
        return {"pred": self._resort(pred_perm, dec_times)}


class SCTSkipConScaledTRandomBFillInModel(BaseSCTFillInModel):
    """Random order; each generated frame is re-encoded and appended to the
    transformer-encoder input for subsequent steps (self_attention.py:400-506)."""

    def _step_decode(self, enc_out, enc_mask, dec_reps, dec_time):
        B = dec_time.shape[0]
        prod_mask = jnp.ones((B, 1, 1), dec_time.dtype)
        dec_out = self.decoder(enc_out, enc_mask, dec_reps[-1], dec_time, prod_mask)
        return self.decode_frames(dec_out, dec_reps)

    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        B, K = preceding.shape[:2]
        F = following.shape[1]
        dt = preceding.dtype
        t_pre1, t_fol1, mask_pre, mask_fol = self._context_times(K, F, dt, lengths)
        t_pre = jnp.broadcast_to(t_pre1[None], (B, K))
        t_fol = jnp.broadcast_to(t_fol1[None], (B, F))
        ctx_mask = jnp.broadcast_to(jnp.concatenate([mask_pre, mask_fol])[None], (B, K + F))

        reps_p = self.encode_frames(preceding)
        reps_f = self.encode_frames(following)

        rng = self.make_rng("sample")
        step_idx = jnp.arange(T)
        if lengths is None:
            perms = jax.vmap(lambda k: jax.random.permutation(k, T))(jax.random.split(rng, B)).astype(dt)
            Tr = jnp.asarray(T, dt)
            step_valid = jnp.ones((T,), dt)
        else:
            # uniform permutation of the runtime-T valid steps via rank
            # ordering (invalid positions rank last); garbage steps generate
            # after every valid one and carry huge times so they resort last
            r = jax.random.uniform(rng, (B, T))
            r = jnp.where((step_idx < lengths[1])[None], r, jnp.inf)
            perms = jnp.argsort(jnp.argsort(r, axis=1), axis=1).astype(dt)
            Tr = jnp.asarray(lengths[1], dt)
            step_valid = (step_idx < lengths[1]).astype(dt)

        def step_time(t):
            base = perms[:, t : t + 1] / Tr + 1.0
            if lengths is None:
                return base
            return jnp.where(step_valid[t] > 0, base, 1e6 + float(t))

        preds: List[jax.Array] = []
        mid_top_reps: List[jax.Array] = []
        mid_times: List[jax.Array] = []
        last_pred_reps = None
        for t in range(T):
            if t == 0:
                enc_in = jnp.concatenate([reps_p[-1], reps_f[-1]], axis=1)
                enc_time = jnp.concatenate([t_pre, t_fol], axis=1)
            else:
                last_pred_reps = self.encode_frames(preds[-1])
                mid_top_reps.append(last_pred_reps[-1])
                enc_in = jnp.concatenate([reps_p[-1], reps_f[-1]] + mid_top_reps, axis=1)
                enc_time = jnp.concatenate([t_pre, t_fol] + mid_times, axis=1)
            # appended generated frames are valid iff their step was valid
            enc_mask = jnp.concatenate(
                [ctx_mask, jnp.broadcast_to(step_valid[None, :t], (B, t))], axis=1
            )
            enc_out = self.encoder(enc_in, enc_mask, enc_time)

            mid_times.append(jnp.where(step_valid[t] > 0, perms[:, t : t + 1] / Tr + 1.0, 0.0)
                             if lengths is not None else perms[:, t : t + 1] / Tr + 1.0)
            dec_reps = self.encode_frames(preceding[:, -1:]) if t == 0 else last_pred_reps
            preds.append(self._step_decode(enc_out, enc_mask, dec_reps, step_time(t)))

        pred_perm = jnp.concatenate(preds, axis=1)
        dec_times = jnp.concatenate([step_time(t) for t in range(T)], axis=1)
        return {"pred": self._resort(pred_perm, dec_times)}


class SCTSkipConScaledTRandomCFillInModel(SCTSkipConScaledTRandomBFillInModel):
    """RandomB + encoder/decoder skip connections (self_attention.py:509-622)."""

    enc_return_all: bool = True
    dec_enc_attend: str = "skip"


class SCTSkipConScaledTRandomDFillInModel(SCTSkipConScaledTRandomBFillInModel):
    """RandomC with same-level encoder attention (self_attention.py:625-634)."""

    enc_return_all: bool = True
    dec_enc_attend: str = "same"


class SCTBypassScaledTForwardFillInModel(SCTSkipConScaledTForwardFillInModel):
    """Forward variant whose frame-decoder skips pass through extra convs
    (self_attention.py:637-682)."""

    def setup(self):
        super().setup()
        self.bypass = [
            _Bypass(self.d_v // (2 ** (3 - i)), name=f"bypass{i}") for i in range(4)
        ]

    def decode_frames(self, dec_out, frame_reps):
        B, T = dec_out.shape[:2]
        x = dec_out
        for stage in range(4):
            skip = frame_reps[-stage - 1]
            if skip.shape[1] == 1:
                skip = jnp.broadcast_to(skip, (B, T, *skip.shape[2:]))
            flat_skip = skip.reshape(B * T, *skip.shape[2:])
            flat_skip = self.bypass[-stage - 1](flat_skip)
            comb = x + flat_skip.reshape(B, T, *flat_skip.shape[1:])
            flat = comb.reshape(B * T, *comb.shape[2:])
            out = self.frame_decoder(flat, stage)
            x = out.reshape(B, T, *out.shape[1:])
        return x


class _Bypass(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.features, 3, name="c1")(x))
        return nn.relu(Conv(self.features, 3, name="c2")(x))


class SCTFrameEncDecBNSkipConScaledTForwardFillInModel(SCTSkipConScaledTForwardFillInModel):
    """Forward variant with a normalized frame codec (self_attention.py:685-778)."""

    frame_norm: bool = True


SCT_CLASSES = {
    "SCTSkipConScaledTForward": SCTSkipConScaledTForwardFillInModel,
    "SCTSkipConScaledTInward": SCTSkipConScaledTInwardFillInModel,
    "SCTSkipConScaledTRandom": SCTSkipConScaledTRandomFillInModel,
    "SCTSkipConScaledTRandomB": SCTSkipConScaledTRandomBFillInModel,
    "SCTSkipConScaledTRandomC": SCTSkipConScaledTRandomCFillInModel,
    "SCTSkipConScaledTRandomD": SCTSkipConScaledTRandomDFillInModel,
    "SCTBypassScaledTForward": SCTBypassScaledTForwardFillInModel,
    "SCTFrameEncDecBNSkipConScaledTForward": SCTFrameEncDecBNSkipConScaledTForwardFillInModel,
}
