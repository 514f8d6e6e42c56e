"""Dynamic int8 quantized convolution for TPU serving.

The v5e MXU executes int8 x int8 -> int32 at twice the bf16 rate, and XLA
lowers ``lax.conv_general_dilated`` on int8 operands to that path natively
(measured: 312 TOP/s = 1.83x bf16 on the 5x5/C=128 tower,
scripts/explore_int8.py).  Since the serving forward is conv-dominated
(profile_infer.py: 71% conv fusions at B=48), an int8 inference mode stacks
a further speedup on bf16 without any custom kernel.

Two schemes, both symmetric (no zero point), selected by VFI_INT8:

VFI_INT8=1 — dynamic ("data-free"):
  * weights:     per-output-channel scale = amax(|w|, axes=(h,w,in)) / 127,
                 requantized from the f32 master params at every apply (the
                 amax+round over weights is negligible next to activation
                 traffic, and it keeps the param pytree IDENTICAL to the
                 bf16/f32 path — same checkpoints, no calibration state);
  * activations: per-tensor scale = amax(|x|) / 127 computed on the fly.
                 MEASURED LOSER end-to-end (benchmarks/ab_int8.py): the
                 amax is a reduction over x, so quantize cannot start until
                 a full extra pass over each conv input completes — the
                 serialized pass costs more than the 2x MXU rate saves.

VFI_INT8=2 — static (calibrated):
  * weights:     as above (still derived from the f32 master params);
  * activations: per-layer scalar scale read from a "quant" flax collection
                 populated by a calibration pass (apply with
                 mutable=["quant"] over representative batches; each QConv
                 keeps the running amax of its input).  Because the scale is
                 a parameter — available before x is produced — XLA fuses
                 the round/clip/cast into the PRODUCING op's epilogue:
                 intermediate activations land in HBM as int8 (half of bf16
                 traffic) and the conv runs at the 2x int8 MXU rate, with
                 no extra pass.
  * accumulation in int32, dequantized in the conv epilogue:
                 y = conv_i8(xq, wq) * (x_scale * w_scale[c]) + b.

Coverage: every model family's conv tower routes through the shared
``nn.layers.Conv`` helper (MC-Net, TAI/TWI kernel nets, SloMo UNet, SCT
frame codecs), so the mode quantizes all of them; the only serving-path
conv NOT quantized is SCT's 1x1 attention value-projection
(nn/transformer.py, a raw nn.Conv — negligible FLOPs).  The VGG16
perceptual tower (nn/vgg.py) is a training-only loss and stays f32/bf16.

No reference equivalent exists (the reference serves f32 CUDA,
src/environments/environments.py:86-89); this is an opt-in,
numerics-changing serving mode (read at model construction/trace time),
NOT the default.  Expected use: quantize an imported trained checkpoint,
calibrate on a few batches, and validate with the standard eval pipeline
(cli/predict.py -> compute_quant_results) against the f32 numbers.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import xavier_conv


def quantize_symmetric(a: jax.Array, axes, eps: float = 1e-12):
    """Symmetric int8 quantization: returns (q_int8, scale_f32).

    ``axes``: reduction axes for the amax (per-tensor when all axes given,
    per-channel when the channel axis is kept).
    """
    a32 = a.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(a32), axis=axes, keepdims=True) / 127.0, eps)
    q = jnp.clip(jnp.round(a32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


class QConv(nn.Module):
    """Drop-in int8 replacement for the shared ``Conv`` helper.

    The "params" collection (names, shapes, dtypes, init) is identical to
    ``nn.Conv`` — "kernel" [kh, kw, in, out] f32 xavier-normal + "bias"
    [out] zeros — so trained/imported checkpoints load unchanged and the
    mode is a pure serving-time switch.  ``static=True`` additionally keeps
    a per-layer activation-amax scalar in the "quant" collection (see module
    docstring); calibrate with ``model.apply(vars, ..., mutable=["quant"])``.
    """

    features: int
    kernel: int
    strides: int = 1
    static: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, c_in = self.kernel, x.shape[-1]
        w = self.param("kernel", xavier_conv, (k, k, c_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)

        wq, w_scale = quantize_symmetric(w, axes=(0, 1, 2))  # [1,1,1,out]
        if self.static:
            # Initialized to 0.0 (not 1.0) so calibration can record amax
            # values below 1 — small-range activations (post-tanh features)
            # would otherwise quantize against a too-large scale.  The 1e-12
            # floor on x_scale below guards the all-zeros-calibration case.
            amax = self.variable(
                "quant", "act_amax", lambda: jnp.asarray(0.0, jnp.float32)
            )
            if self.is_mutable_collection("quant"):  # calibration pass
                cur = jnp.max(jnp.abs(x.astype(jnp.float32)))
                amax.value = jnp.maximum(amax.value.astype(jnp.float32), cur)
            x_scale = jnp.maximum(amax.value.astype(jnp.float32) / 127.0, 1e-12)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / x_scale), -127, 127
            ).astype(jnp.int8)
        else:
            xq, x_scale = quantize_symmetric(x, axes=(0, 1, 2, 3))  # scalar
        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            window_strides=(self.strides, self.strides),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (x_scale.reshape(()) * w_scale.reshape(-1)) + b
        return y.astype(x.dtype)
