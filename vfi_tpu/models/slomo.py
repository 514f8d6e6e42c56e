"""Super SloMo (Jiang et al. 2018) fill-in baseline.

Behavioral reference: src/models/slomo/slomo.py.  Uses only the last
preceding and first following frame: a 6-stage UNet computes bidirectional
flows F_0_1/F_1_0, then for each middle time t the flows are synthesized,
refined by a second UNet, and the two warped frames are blended with a
learned visibility map (slomo.py:289-342).

TPU-first re-design:
  * The per-t Python loop (slomo.py:311-340) is fully independent across t —
    here all T middle frames run as one batch (T folded into batch) through
    the refine UNet.
  * Reference quirk NOT preserved: the reference prepends each new frame so
    its 'pred' tensor is in *reversed* time order (slomo.py:338-340); we
    return natural time order, which is what its own loss/eval code assumes.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import Conv
from ..ops.image import time_weights, upsample2x_bilinear
from ..ops.warp import flow_warp


class SloMoEncoder(nn.Module):
    """6-stage UNet encoder (7/7, 5/5, then 3/3 kernels), leaky-relu 0.1
    (reference slomo.py:28-98)."""

    gf_dim: int
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x):
        g = self.gf_dim
        skips = []
        for i, (mult, k) in enumerate([(1, 7), (2, 5), (4, 3), (8, 3), (16, 3), (16, 3)]):
            if i > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.leaky_relu(Conv(g * mult, k, name=f"e{i}a")(x), self.alpha)
            x = nn.leaky_relu(Conv(g * mult, k, name=f"e{i}b")(x), self.alpha)
            if i < 5:
                skips.append(x)
        return x, skips


class SloMoDecoder(nn.Module):
    """5-stage UNet decoder with skip concatenation (slomo.py:101-178)."""

    gf_dim: int
    out_dim: int
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x, skips):
        g = self.gf_dim
        for i, (m1, m2) in enumerate([(16, 8), (8, 4), (4, 2), (2, 1), (1, 1)]):
            # align_corners=True matches the reference's torch-0.3
            # nn.Upsample(mode='bilinear') (slomo.py:113-149) — required for
            # imported-checkpoint parity.
            x = upsample2x_bilinear(x, align_corners=True)
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = nn.leaky_relu(Conv(g * m1, 3, name=f"d{i}a")(x), self.alpha)
            x = nn.leaky_relu(Conv(g * m2, 3, name=f"d{i}b")(x), self.alpha)
        return Conv(self.out_dim, 1, name="out")(x)


class SloMoFillInModel(nn.Module):
    base_dim: int = 32
    c_dim: int = 3
    # "pixel" for from-scratch training; "torch03" reproduces the reference
    # FlowWarper's grid_sample semantics bit-faithfully — set when evaluating
    # imported reference checkpoints (see ops/warp.py).
    warp_mode: str = "pixel"

    @nn.compact
    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        """``lengths``: optional traced (K, T_real, F) for the dynamic path —
        SloMo only reads the last preceding / first following frame, which the
        padded layout keeps at fixed positions, so only the per-t time values
        change (frames at t >= T_real are garbage and masked by the caller)."""
        c = self.c_dim
        I0 = preceding[:, -1]
        I1 = following[:, 0]
        B = I0.shape[0]

        # Flow computation UNet
        x, skips = SloMoEncoder(self.base_dim, name="compute_enc")(jnp.concatenate([I0, I1], axis=-1))
        flows = jnp.tanh(SloMoDecoder(self.base_dim, 4, name="compute_dec")(x, skips))
        F_0_1 = flows[..., :2]
        F_1_0 = flows[..., 2:]

        # Per-t flow synthesis, vectorized over t (t folded into batch).
        if lengths is None:
            t = time_weights(T, I0.dtype)
        else:
            from ..ops.dynamic import dynamic_time_weights

            t = dynamic_time_weights(lengths[1], T, I0.dtype)
        t = t[:, None, None, None, None]  # [T,1,1,1,1]
        F01 = F_0_1[None]
        F10 = F_1_0[None]
        F_t_0 = -(1 - t) * t * F01 + t**2 * F10  # [T, B, H, W, 2]
        F_t_1 = (1 - t) * (1 - t) * F01 - t * (1 - t) * F10

        def fold(a):
            return a.reshape(T * B, *a.shape[2:])

        I0r = fold(jnp.broadcast_to(I0[None], (T, *I0.shape)))
        I1r = fold(jnp.broadcast_to(I1[None], (T, *I1.shape)))
        Ft0 = fold(F_t_0)
        Ft1 = fold(F_t_1)

        g_I0 = flow_warp(I0r, Ft0, self.warp_mode)
        g_I1 = flow_warp(I1r, Ft1, self.warp_mode)

        refine_in = jnp.concatenate([I0r, g_I0, Ft0, Ft1, g_I1, I1r], axis=-1)
        x, skips = SloMoEncoder(self.base_dim, name="refine_enc")(refine_in)
        refine_out = SloMoDecoder(self.base_dim, 5, name="refine_dec")(x, skips)
        dF_t_0 = jnp.tanh(refine_out[..., 0:2])
        dF_t_1 = jnp.tanh(refine_out[..., 2:4])
        V_t_0 = nn.sigmoid(refine_out[..., 4:5])

        Ft0_r = jnp.clip(Ft0 + dF_t_0, -1.0, 1.0)
        Ft1_r = jnp.clip(Ft1 + dF_t_1, -1.0, 1.0)
        V_t_1 = 1.0 - V_t_0
        g0 = flow_warp(I0r, Ft0_r, self.warp_mode)
        g1 = flow_warp(I1r, Ft1_r, self.warp_mode)

        tf = fold(jnp.broadcast_to(t, (T, B, 1, 1, 1)))
        norm = (1 - tf) * V_t_0 + tf * V_t_1
        interp = ((1 - tf) * V_t_0 * g0 + tf * V_t_1 * g1) / norm

        def unfold(a):
            return jnp.swapaxes(a.reshape(T, B, *a.shape[1:]), 0, 1)

        return {
            "pred": unfold(interp),
            "F_0_1": F_0_1,
            "F_1_0": F_1_0,
            "F_t_0_collector": unfold(Ft0),
            "F_t_1_collector": unfold(Ft1),
        }
