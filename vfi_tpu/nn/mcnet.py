"""MC-Net (Villegas et al., "Decomposing Motion and Content for Natural Video
Sequence Prediction") — the shared autoregressive video predictor.

Behavioral reference: src/models/mcnet/mcnet.py.  Re-designed NHWC/flax:
  * encoders/decoder are plain compact modules;
  * the K-step warm-up and the T-step autoregressive rollout are expressed so
    the whole thing jits to one XLA program (T, K static);
  * the per-step "next motion encoding" is computed at the *end* of each step
    so the rollout body is branch-free.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.image import fixed_unpooling, to_gray_frames
from .layers import Conv, ConvLSTMCell, first_conv, max_pool2


class MotionEnc(nn.Module):
    """Difference-frame encoder; returns encoding + 3 residual activations.

    Reference: mcnet.py:14-60 (5/5/7 kernels, maxpool between stages).
    """

    gf_dim: int

    @nn.compact
    def __call__(self, diff):
        r1 = nn.relu(first_conv(self.gf_dim, 5, diff.shape[-1], name="dyn1")(diff))
        r2 = nn.relu(Conv(self.gf_dim * 2, 5, name="dyn2")(max_pool2(r1)))
        r3 = nn.relu(Conv(self.gf_dim * 4, 7, name="dyn3")(max_pool2(r2)))
        return max_pool2(r3), (r1, r2, r3)


class ContentEnc(nn.Module):
    """Raw-frame encoder (VGG-ish 2/2/3-layer stages); reference mcnet.py:63-119."""

    gf_dim: int

    @nn.compact
    def __call__(self, frame):
        g = self.gf_dim
        x = nn.relu(first_conv(g, 3, frame.shape[-1], name="c1a")(frame))
        r1 = nn.relu(Conv(g, 3, name="c1b")(x))
        x = nn.relu(Conv(g * 2, 3, name="c2a")(max_pool2(r1)))
        r2 = nn.relu(Conv(g * 2, 3, name="c2b")(x))
        x = nn.relu(Conv(g * 4, 3, name="c3a")(max_pool2(r2)))
        x = nn.relu(Conv(g * 4, 3, name="c3b")(x))
        r3 = nn.relu(Conv(g * 4, 3, name="c3c")(x))
        return max_pool2(r3), (r1, r2, r3)


class CombLayers(nn.Module):
    """Fuse motion+content encodings (reference mcnet.py:122-153)."""

    gf_dim: int

    @nn.compact
    def __call__(self, h_dyn, h_cont):
        g = self.gf_dim
        x = jnp.concatenate([h_dyn, h_cont], axis=-1)
        x = nn.relu(Conv(g * 4, 3, name="comb1")(x))
        x = nn.relu(Conv(g * 2, 3, name="comb2")(x))
        return nn.relu(Conv(g * 4, 3, name="comb3")(x))


class Residual(nn.Module):
    """Pairwise residual fusion: conv-relu-conv on the channel-concat
    (reference mcnet.py:156-185)."""

    out_dim: int

    @nn.compact
    def __call__(self, a, b):
        x = jnp.concatenate([a, b], axis=-1)
        x = nn.relu(Conv(self.out_dim, 3, name="res1")(x))
        return Conv(self.out_dim, 3, name="res2")(x)


class DecCnn(nn.Module):
    """3-stage decoder with zero-stuffing unpooling and residual skips
    (reference mcnet.py:188-238).  Tanh output in [-1, 1]."""

    c_dim: int
    gf_dim: int

    @nn.compact
    def __call__(self, comb, res1, res2, res3):
        g = self.gf_dim
        x = fixed_unpooling(comb) + res3
        x = nn.relu(Conv(g * 4, 3, name="d3a")(x))
        x = nn.relu(Conv(g * 4, 3, name="d3b")(x))
        x = nn.relu(Conv(g * 2, 3, name="d3c")(x))
        x = fixed_unpooling(x) + res2
        x = nn.relu(Conv(g * 2, 3, name="d2a")(x))
        x = nn.relu(Conv(g, 3, name="d2b")(x))
        x = fixed_unpooling(x) + res1
        x = nn.relu(Conv(g, 3, name="d1a")(x))
        return jnp.tanh(Conv(self.c_dim, 3, name="d1b")(x))


class RolloutStep(NamedTuple):
    """Per-timestep outputs of the MC-Net rollout, stacked over a leading T axis."""

    pred: jax.Array  # [T, B, H, W, C]
    dyn: jax.Array  # [T, B, H/8, W/8, 4g]
    cont: jax.Array  # [T, B, H/8, W/8, 4g]
    res1: jax.Array  # [T, B, H,   W,   g]
    res2: jax.Array  # [T, B, H/2, W/2, 2g]
    res3: jax.Array  # [T, B, H/4, W/4, 4g]


class MCNet(nn.Module):
    """The MC-Net predictor: K-1 warm-up steps over difference frames, then a
    T-step autoregressive rollout re-feeding predicted-frame differences
    (reference mcnet.py:391-453)."""

    gf_dim: int
    c_dim: int
    lstm_kernel: int = 3
    forget_bias: float = 1.0
    remat: bool = False  # gradient-checkpoint the per-step submodules
                         # (trade ~33% recompute for O(T) -> O(1) rollout
                         # activation memory; enables larger batches/res)
    scan_rollout: bool = False  # express rollout steps 1..T-1 as one
                                # lax.scan body (compile-time win on the big
                                # program; runtime-neutral — see CLAUDE.md
                                # round-3 measurements before flipping default)

    def setup(self):
        def maybe_remat(cls):
            return nn.remat(cls) if self.remat else cls

        self.motion_enc = maybe_remat(MotionEnc)(self.gf_dim)
        self.content_enc = maybe_remat(ContentEnc)(self.gf_dim)
        self.conv_lstm = ConvLSTMCell(4 * self.gf_dim, self.lstm_kernel, self.forget_bias)
        self.comb_layers = maybe_remat(CombLayers)(self.gf_dim)
        self.residual1 = maybe_remat(Residual)(self.gf_dim)
        self.residual2 = maybe_remat(Residual)(self.gf_dim * 2)
        self.residual3 = maybe_remat(Residual)(self.gf_dim * 4)
        self.dec_cnn = maybe_remat(DecCnn)(self.c_dim, self.gf_dim)

    def __call__(
        self,
        T: int,
        diff_in: jax.Array,
        xt: jax.Array,
        warmup_skip: jax.Array | None = None,
    ) -> RolloutStep:
        """Run warm-up over all given difference frames, then roll out T steps.

        :param T: number of frames to predict (static)
        :param diff_in: grayscale difference frames ``[B, K-1, H, W, 1]``
        :param xt: the content frame (last context frame) ``[B, H, W, C]``
        :param warmup_skip: optional traced count (scalar or [B]) of *invalid*
            leading warm-up steps — used by the dynamic-(K,T,F) path where the
            preceding frames are right-aligned in a max_K buffer
            (vfi_tpu/ops/dynamic.py).  Masked steps leave the LSTM state
            untouched, so the result equals a shorter warm-up exactly.
        """
        B, Km1, H, W, _ = diff_in.shape
        state = ConvLSTMCell.initial_state(B, H // 8, W // 8, 4 * self.gf_dim, xt.dtype)

        # Warm-up: the reference runs motion-enc + LSTM over the K-1 observed
        # difference frames; the last step's (h_dyn, res_m) seed prediction t=0.
        # All warm-up difference frames are known upfront, so MotionEnc runs as
        # ONE batched call over B*(K-1) (the convs are per-sample independent —
        # exact same numbers, far better MXU utilization than K-1 sequential
        # calls); only the cheap 16x16 ConvLSTM chain stays sequential.
        flat = diff_in.reshape((B * Km1,) + diff_in.shape[2:])
        enc_all, res_all = self.motion_enc(flat)
        enc_all = enc_all.reshape((B, Km1) + enc_all.shape[1:])
        res_m = tuple(r.reshape((B, Km1) + r.shape[1:])[:, -1] for r in res_all)

        h_dyn = None
        for t in range(Km1):
            new_h_dyn, new_state = self.conv_lstm(enc_all[:, t], state)
            if warmup_skip is None:
                h_dyn, state = new_h_dyn, new_state
            else:
                valid = jnp.reshape(t >= warmup_skip, (-1, 1, 1, 1)).astype(state.dtype)
                state = valid * new_state + (1.0 - valid) * state
                h_dyn = new_h_dyn  # overwritten by the (always valid) last step

        def predict(mod, xt, h_dyn, res_m):
            """The t-th prediction given the current motion context.  Takes the
            module explicitly so the nn.scan body uses the scan-transformed
            instance, not the outer ``self``."""
            h_cont, res_c = mod.content_enc(xt)
            h_tpl = mod.comb_layers(h_dyn, h_cont)
            r1 = mod.residual1(res_m[0], res_c[0])
            r2 = mod.residual2(res_m[1], res_c[1])
            r3 = mod.residual3(res_m[2], res_c[2])
            x_hat = mod.dec_cnn(h_tpl, r1, r2, r3)
            return RolloutStep(x_hat, h_dyn, h_cont, r1, r2, r3)

        step0 = predict(self, xt, h_dyn, res_m)

        if self.scan_rollout and T > 1:
            # Steps 1..T-1 as one scan body (motion update at the START of the
            # step, so step 0 peels off and no trailing motion step is wasted).
            def body(mod, carry, _):
                state, xt_prev, x_hat = carry
                new_diff = to_gray_frames(x_hat) - to_gray_frames(xt_prev)
                enc_h, res_m = mod.motion_enc(new_diff)
                h_dyn, state = mod.conv_lstm(enc_h, state)
                step = predict(mod, x_hat, h_dyn, res_m)
                return (state, x_hat, step.pred), step

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=T - 1,
            )
            _, rest = scan(self, (state, xt, step0.pred), None)
            return RolloutStep(
                *(jnp.concatenate([a[None], b]) for a, b in zip(step0, rest))
            )

        steps = [step0]
        for t in range(1, T):
            # Next motion input: grayscale difference between the newly
            # predicted frame and the previous content frame
            # (reference mcnet.py:438-449).
            x_hat = steps[-1].pred
            new_diff = to_gray_frames(x_hat) - to_gray_frames(xt)
            enc_h, res_m = self.motion_enc(new_diff)
            h_dyn, state = self.conv_lstm(enc_h, state)
            xt = x_hat
            steps.append(predict(self, xt, h_dyn, res_m))

        return RolloutStep(*(jnp.stack(f) for f in zip(*steps)))
