"""Legacy (superseded) SCT fill-in variants.

Behavioral reference: src/models/self_attention/old_self_attention.py — two
early conv-transformer models that the reference keeps on disk but never
imports into its registry module (create_model.py:6-17), so they are dead code
there.  They are included here for completeness of the component inventory
(SURVEY.md §2.2 "Legacy SCT") and are reachable the same way any unregistered
class is: through the JSON ``model_key`` fallback, e.g.
``--model_key '{"class": "SCTSkipConFillInModel", "args": [], "kwargs":
{"c_dim": 1, "num_blocks": 2, "num_heads": 3, "d_v": 256, "d_ff": 2048}}'``.

Differences from the modern family (models/sct.py), per the reference source:

* **Unscaled integer time steps** (old_self_attention.py:145-147,161-162):
  context frames sit at ``0..K-1`` and ``K+T..K+T+F-1`` and middle frames at
  ``K..K+T-1`` — the modern variants rescale these ranges into [0,1) / [1,2) /
  [2,3) ("ScaledT").  The sinusoidal PE consumes either parametrization.
* **One generation order** — earliest-to-latest with a causal tril mask
  (old_self_attention.py:167-174); no inward/random orders.
* ``SCTSkipConFillInModel`` seeds the decoder with the last preceding frame
  (old_self_attention.py:158); ``SCTSuperSkipConFillInModel`` seeds with a
  zero "start token" (old_self_attention.py:393-399) and swaps in the
  skip-connected transformer encoder/decoder pair (old_self_attention.py:
  321-322), i.e. decoder level i cross-attends encoder level n-i.
* The frame codec and the teacher-forced ``forward_train`` (shifted decoder
  inputs, old_self_attention.py:184-241) are identical in structure to the
  modern family and are reused directly from ``BaseSCTFillInModel``.

Static shapes only: the reference legacy classes predate the (K, T, F)
curriculum, and dead-code parity does not extend the dynamic-length surface.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .sct import BaseSCTFillInModel


class SCTSkipConFillInModel(BaseSCTFillInModel):
    """Legacy forward-order SCT with unscaled times
    (old_self_attention.py:9-241)."""

    def _seed_frames(self, preceding):
        """Decoder seed: the last preceding frame (old_self_attention.py:158)."""
        return preceding[:, -1:]

    def _times(self, T: int, K: int, F: int, B: int, dt):
        """Unscaled integer time steps (old_self_attention.py:145-147,161-162)."""
        enc_t = jnp.concatenate(
            [jnp.arange(K, dtype=dt), jnp.arange(K + T, K + T + F, dtype=dt)]
        )
        dec_t = jnp.arange(K, K + T, dtype=dt)
        return (
            jnp.broadcast_to(enc_t[None], (B, K + F)),
            jnp.broadcast_to(dec_t[None], (B, T)),
        )

    def _encode_context(self, T: int, preceding, following):
        B, K = preceding.shape[:2]
        F = following.shape[1]
        dt = preceding.dtype
        enc_time, dec_time = self._times(T, K, F, B, dt)
        enc_mask = jnp.ones((B, K + F), dt)
        frames = jnp.concatenate([preceding, following], axis=1)
        reps = self.encode_frames(frames)
        enc_out = self.encoder(reps[-1], enc_mask, enc_time)
        return enc_out, enc_mask, dec_time

    def _decode(self, T: int, dec_in_frames, enc_out, enc_mask, dec_time):
        """Transformer-decode T steps under a causal mask, then frame-decode
        with skip-adds from the decoder-input pyramid
        (old_self_attention.py:167-177)."""
        B = dec_in_frames.shape[0]
        dec_reps = self.encode_frames(dec_in_frames)
        prod_mask = jnp.broadcast_to(
            jnp.tril(jnp.ones((T, T), dec_in_frames.dtype))[None], (B, T, T)
        )
        dec_out = self.decoder(enc_out, enc_mask, dec_reps[-1], dec_time, prod_mask)
        return self.decode_frames(dec_out, dec_reps)

    def __call__(self, T: int, preceding, following) -> Dict[str, Any]:
        enc_out, enc_mask, dec_time = self._encode_context(T, preceding, following)
        pred = self._decode(T, self._seed_frames(preceding), enc_out, enc_mask, dec_time)
        return {"pred": pred}

    def forward_train(self, T: int, preceding, following, gt_middle) -> Dict[str, Any]:
        """Teacher-forced single pass: decoder inputs are the seed frame
        followed by the first T-1 GT middle frames
        (old_self_attention.py:184-241)."""
        enc_out, enc_mask, dec_time = self._encode_context(T, preceding, following)
        seed = self._seed_frames(preceding)
        dec_in = jnp.concatenate([seed, gt_middle[:, : T - 1]], axis=1) if T > 1 else seed
        pred = self._decode(T, dec_in, enc_out, enc_mask, dec_time)
        return {"pred": pred}


class SCTSuperSkipConFillInModel(SCTSkipConFillInModel):
    """Legacy variant with a zero start token and skip-connected transformer
    encoder/decoder (old_self_attention.py:244-488)."""

    enc_return_all: bool = True
    dec_enc_attend: str = "skip"

    def _seed_frames(self, preceding):
        """Zero start token in place of a real frame (old_self_attention.py:393-399)."""
        B, _, H, W, C = preceding.shape
        return jnp.zeros((B, 1, H, W, C), preceding.dtype)
