"""Fill-in models: the uniform `(T, preceding, following) -> dict` model zoo.

All video tensors are batch-major NHWC: ``[B, T, H, W, C]`` in [-1, 1].
Every model returns at least ``{'pred': [B, T, H, W, C]}``; bidirectional
models add ``pred_forward`` / ``pred_backward``; TAI/TWI additionally return
the pre-blend interpolation-net outputs.

Behavioral references:
  * TAIFillInModel           — src/models/tai/tai.py:14-120
  * TWI fill-in              — src/models/twi/twi.py:15-122
  * bi-TWA                   — src/models/bi_twa/bi_twa.py:10-67
  * bi-SA                    — src/models/bi_sa/bi_sa.py:10-62
  * MC-Net forward-only      — src/models/mcnet/mcnet.py:301-347
  * TW_P_F trivial baseline  — src/models/tw_p_f/tw_p_f.py:6-34

TPU-first re-design decisions (vs. the reference's per-frame Python loops):
  * When K == F the forward and backward MC-Net rollouts run as ONE rollout
    over a doubled batch — the two streams are embarrassingly parallel
    (SURVEY.md §2.5) and the MXU likes the bigger batch.
  * The per-timestep TAI/TWI blending loop (tai.py:91-105) is folded into the
    batch axis: one KernelNet application over B*T elements with a per-element
    ratio vector.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.kernelnet import KernelNet
from ..nn.mcnet import MCNet, Residual, RolloutStep
from ..ops.image import time_weights, to_gray_frames


def _diff_frames(frames: jax.Array) -> jax.Array:
    """Grayscale forward-difference frames: [B, N, H, W, C] -> [B, N-1, H, W, 1]."""
    g = to_gray_frames(frames)
    return g[:, 1:] - g[:, :-1]


def _bt(x: jax.Array) -> jax.Array:
    """Time-major [T, B, ...] -> batch-major [B, T, ...]."""
    return jnp.swapaxes(x, 0, 1)


def _fold(x: jax.Array) -> jax.Array:
    """[T, B, ...] -> [T*B, ...] (t-major fold, so ratio repeats per t)."""
    return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])


class BidirectionalMCNetModel(nn.Module):
    """Shared machinery: run MC-Net forward from the preceding frames and
    backward from the time-reversed following frames; return both rollouts
    (backward already re-reversed to natural time order, time-major)."""

    gf_dim: int
    c_dim: int
    feature_size: int = 3
    forget_bias: float = 1.0
    remat: bool = False  # gradient-checkpoint rollout submodules (memory/compute trade)
    scan_rollout: bool = False  # lax.scan rollout body (see nn/mcnet.py)

    def setup(self):
        self.mcnet = MCNet(self.gf_dim, self.c_dim, self.feature_size, self.forget_bias,
                           remat=self.remat, scan_rollout=self.scan_rollout)

    def bidirectional_rollout(self, T, preceding, following, lengths=None) -> tuple[RolloutStep, RolloutStep]:
        """Run both MC-Net streams.

        :param lengths: None for static shapes, or traced (K, T_real, F)
            scalars for the dynamic path — then ``preceding`` is right-aligned
            in a max_K buffer and ``following`` left-aligned in a max_F buffer
            (vfi_tpu/ops/dynamic.py), and the returned backward stream is in
            *rollout* order (reverse with reverse_middle(T_real) downstream).
        """
        B, max_K = preceding.shape[:2]
        max_F = following.shape[1]
        xt = preceding[:, -1]
        xt_b = following[:, 0]
        diff_f = _diff_frames(preceding)
        diff_b = _diff_frames(following[:, ::-1])

        if lengths is None:
            skip_f = skip_b = None
        else:
            K, _, F = lengths
            skip_f = jnp.broadcast_to(max_K - K, (B,))
            skip_b = jnp.broadcast_to(max_F - F, (B,))

        if max_K == max_F:
            # One rollout over the doubled batch; split afterwards.
            skip = None if lengths is None else jnp.concatenate([skip_f, skip_b])
            out = self.mcnet(
                T,
                jnp.concatenate([diff_f, diff_b], axis=0),
                jnp.concatenate([xt, xt_b], axis=0),
                warmup_skip=skip,
            )
            fwd = jax.tree.map(lambda a: a[:, :B], out)
            bwd = jax.tree.map(lambda a: a[:, B:], out)
        else:
            fwd = self.mcnet(T, diff_f, xt, warmup_skip=skip_f)
            bwd = self.mcnet(T, diff_b, xt_b, warmup_skip=skip_b)

        if lengths is None:
            # Backward stream was generated in reversed time; restore natural
            # order (reference tai.py:80-83).
            bwd = jax.tree.map(lambda a: a[::-1], bwd)
        return fwd, bwd


class TAIFillInModel(BidirectionalMCNetModel):
    """bi-TAI: bidirectional MC-Net + time-aware adaptive-kernel blending."""

    ks: int = 51
    num_block: int = 5
    kf_dim: int = 32
    layers: int = 3
    use_ratio: bool = True  # False -> TWI
    sepconv_impl: str | None = None
    align_corners: bool = True  # torch-0.3 Upsample parity (see nn/kernelnet.py)

    def setup(self):
        super().setup()
        self.merge_residual2 = Residual(self.kf_dim * 2)
        self.merge_residual3 = Residual(self.kf_dim * 4)
        self.kernelnet = KernelNet(
            self.gf_dim,
            self.ks,
            self.num_block,
            self.layers,
            self.kf_dim,
            use_ratio=self.use_ratio,
            sepconv_impl=self.sepconv_impl,
            align_corners=self.align_corners,
        )

    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        B = preceding.shape[0]
        fwd, bwd = self.bidirectional_rollout(T, preceding, following, lengths)
        if lengths is not None:
            from ..ops.dynamic import reverse_middle

            bwd = jax.tree.map(lambda a: reverse_middle(a, lengths[1]), bwd)

        # Fold T into batch and blend every middle frame at once.
        m2 = self.merge_residual2(_fold(fwd.res2), _fold(bwd.res2))
        m3 = self.merge_residual3(_fold(fwd.res3), _fold(bwd.res3))

        if lengths is None:
            w = time_weights(T, preceding.dtype)  # weight of the backward stream
        else:
            from ..ops.dynamic import dynamic_time_weights

            w = dynamic_time_weights(lengths[1], T, preceding.dtype)
        ratio = jnp.repeat(1.0 - w, B)  # reference passes ratio=1-w[t] (tai.py:99)
        dot1, dot2 = self.kernelnet(
            _fold(fwd.pred),
            _fold(bwd.pred),
            _fold(fwd.dyn),
            _fold(bwd.dyn),
            _fold(fwd.cont),
            _fold(bwd.cont),
            m2,
            m3,
            ratio,
        )
        dot1 = dot1.reshape(T, B, *dot1.shape[1:])
        dot2 = dot2.reshape(T, B, *dot2.shape[1:])

        if self.use_ratio:
            comb = 0.5 * dot1 + 0.5 * dot2  # TAI blend (tai.py:105)
        else:
            wt = w[:, None, None, None, None]
            comb = (1.0 - wt) * dot1 + wt * dot2  # TWI blend (twi.py:105)

        return {
            "pred": _bt(comb),
            "pred_forward": _bt(fwd.pred),
            "pred_backward": _bt(bwd.pred),
            "interp_net_outputs_1": _bt(dot1),
            "interp_net_outputs_2": _bt(dot2),
        }


class TWIFillInModel(TAIFillInModel):
    """bi-TWI ablation: time-agnostic kernel net + time-weighted blend."""

    use_ratio: bool = False


class BidirectionalTimeWeightedAverageFillInModel(BidirectionalMCNetModel):
    """bi-TWA: time-weighted average of the raw forward/backward predictions."""

    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        fwd, bwd = self.bidirectional_rollout(T, preceding, following, lengths)
        if lengths is None:
            w = time_weights(T, preceding.dtype)
        else:
            from ..ops.dynamic import dynamic_time_weights, reverse_middle

            bwd = jax.tree.map(lambda a: reverse_middle(a, lengths[1]), bwd)
            w = dynamic_time_weights(lengths[1], T, preceding.dtype)
        w = w[:, None, None, None, None]
        comb = (1.0 - w) * fwd.pred + w * bwd.pred
        return {
            "pred": _bt(comb),
            "pred_forward": _bt(fwd.pred),
            "pred_backward": _bt(bwd.pred),
        }


class BidirectionalSimpleAverageFillInModel(BidirectionalMCNetModel):
    """bi-SA: plain 0.5/0.5 average of the two streams."""

    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        fwd, bwd = self.bidirectional_rollout(T, preceding, following, lengths)
        if lengths is not None:
            from ..ops.dynamic import reverse_middle

            bwd = jax.tree.map(lambda a: reverse_middle(a, lengths[1]), bwd)
        comb = 0.5 * fwd.pred + 0.5 * bwd.pred
        return {
            "pred": _bt(comb),
            "pred_forward": _bt(fwd.pred),
            "pred_backward": _bt(bwd.pred),
        }


class MCNetFillInModel(nn.Module):
    """Forward-only baseline: predict the middle frames from the preceding
    frames alone (reference mcnet.py:301-347)."""

    gf_dim: int
    c_dim: int
    feature_size: int = 3
    forget_bias: float = 1.0
    remat: bool = False
    scan_rollout: bool = False

    def setup(self):
        self.mcnet = MCNet(self.gf_dim, self.c_dim, self.feature_size, self.forget_bias,
                           remat=self.remat, scan_rollout=self.scan_rollout)

    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        del following
        skip = None
        if lengths is not None:
            skip = jnp.broadcast_to(preceding.shape[1] - lengths[0], (preceding.shape[0],))
        out = self.mcnet(T, _diff_frames(preceding), preceding[:, -1], warmup_skip=skip)
        return {"pred": _bt(out.pred)}


class TimeWeightedPFFillInModel(nn.Module):
    """Parameter-free baseline: per-timestep weighted average of the last
    preceding and first following frame (reference tw_p_f.py:13-34)."""

    @nn.compact
    def __call__(self, T: int, preceding, following, lengths=None) -> Dict[str, Any]:
        last_p = preceding[:, -1:]  # [B, 1, H, W, C]
        first_f = following[:, :1]
        if lengths is None:
            w = time_weights(T, preceding.dtype)
        else:
            from ..ops.dynamic import dynamic_time_weights

            w = dynamic_time_weights(lengths[1], T, preceding.dtype)
        w = w[None, :, None, None, None]
        pred = (1.0 - w) * last_p + w * first_f
        return {"pred": pred}
