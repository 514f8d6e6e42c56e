"""Shared flax layer helpers: init conventions, pooling, ConvLSTM.

Init parity: the reference xavier-normal-initializes every conv and zeroes
biases (src/util/util.py:193-202); we bake that into the conv constructor so
models don't need a separate init pass.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier_conv = nn.initializers.xavier_normal()


def Conv(features: int, kernel: int, *, strides: int = 1, name: str | None = None):
    """3x3/5x5/7x7 'same' conv with xavier-normal init and zero bias.

    VFI_INT8 (read at model-construction/trace time, like VFI_PAD_C1)
    swaps in the int8 ``QConv`` serving mode — identical "params" pytree,
    int8 MXU compute (see nn/quant.py): 1 = dynamic per-batch scales,
    2 = static calibrated scales (a "quant" flax collection).
    """
    import os

    mode = os.environ.get("VFI_INT8", "0")
    if mode in ("1", "2"):
        from .quant import QConv

        return QConv(features, kernel, strides=strides, static=(mode == "2"), name=name)
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(strides, strides),
        padding="SAME",
        kernel_init=xavier_conv,
        bias_init=nn.initializers.zeros_init(),
        name=name,
    )


class PadC1Conv(nn.Module):
    """'SAME' conv over a single-channel input with the input zero-padded to
    8 channels (and the kernel zero-padded to match) at apply time.

    Numerically identical to ``Conv`` — the padded channels are exact zeros
    times exact-zero weights — with an identical param pytree ("kernel" of
    shape [k, k, 1, features] + "bias", xavier/zeros init), so checkpoints
    and goldens are unaffected.  Purpose: a C=1 minor dim forces Mosaic/XLA
    into degenerate layouts around the rollout's first-stage convs (the
    ~7% "C=1 layout flip" bucket in the round-3 G-step profile); an 8-wide
    minor dim matches the sublane tile.  Opt-in experiment — enable with
    VFI_PAD_C1=1 (read at module-construction/trace time).
    """

    features: int
    kernel: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] == 1, "PadC1Conv is for single-channel inputs"
        k = self.kernel
        # param_dtype stays f32 (flax nn.Conv default); compute in x.dtype
        w = self.param("kernel", xavier_conv, (k, k, 1, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 7)))
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 7), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, wp.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(x.dtype)


def first_conv(features: int, kernel: int, c_in: int, *, name: str | None = None):
    """dyn1/c1a constructor: plain Conv, or PadC1Conv for single-channel
    inputs under VFI_PAD_C1=1 (identical params/numerics either way)."""
    import os

    if c_in == 1 and os.environ.get("VFI_PAD_C1", "0") == "1":
        return PadC1Conv(features, kernel, name=name)
    return Conv(features, kernel, name=name)


def max_pool2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool via block-reshape + reduce-max.

    Forward-identical to ``nn.max_pool`` (non-overlapping windows), but its
    gradient is an elementwise tie-split mask instead of XLA's
    ``select_and_scatter_add`` — measured 4% of the MC-Net G fwd+grad program
    on v5e (CLAUDE.md round-3 profiling).  Gradient semantics differ from the
    torch reference only on exact ties inside a window: torch routes the
    cotangent to the first argmax, reduce-max splits it among ties.  Every use
    in this codebase pools post-ReLU activations, where tied values are the
    ReLU-clamped zeros whose cotangent the ReLU backward kills anyway, so the
    difference is confined to measure-zero positive ties (bf16 quantization
    can manufacture a few; harmless training noise).
    """
    B, H, W, C = x.shape
    if H % 2 or W % 2:  # odd extents: keep the windowed implementation
        return nn.max_pool(x, (2, 2), strides=(2, 2))
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.max(axis=(2, 4))


def avg_pool2(x: jax.Array) -> jax.Array:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ConvBlock(nn.Module):
    """`num_layers` x (conv -> relu) with constant output width.

    Mirrors the reference's create_basic_conv_block (src/models/tai/tai.py:244-263).
    """

    features: int
    num_layers: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = nn.relu(Conv(self.features, self.kernel, name=f"conv{i}")(x))
        return x


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell (Shi et al. 2015) with a forget-gate bias.

    State is carried as a single array ``[B, H, W, 2*features]`` holding
    (c, h) on the channel axis, matching the reference's packed-state layout
    (src/models/mcnet/mcnet.py:259-294) — convenient for scan carries.
    """

    features: int
    kernel: int = 3
    forget_bias: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array, state: jax.Array) -> tuple[jax.Array, jax.Array]:
        c, h = jnp.split(state, 2, axis=-1)
        gates = Conv(4 * self.features, self.kernel, name="gates")(jnp.concatenate([x, h], axis=-1))
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        new_c = c * nn.sigmoid(f + self.forget_bias) + nn.sigmoid(i) * jnp.tanh(j)
        new_h = jnp.tanh(new_c) * nn.sigmoid(o)
        return new_h, jnp.concatenate([new_c, new_h], axis=-1)

    @staticmethod
    def initial_state(batch: int, height: int, width: int, features: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((batch, height, width, 2 * features), dtype)
