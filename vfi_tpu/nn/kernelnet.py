"""The TAI / TWI kernel-prediction ("interpolation") network.

Takes the MC-Net forward/backward predictions plus their motion/content
encodings, runs a small U-Net over the concatenated encodings, and emits four
per-pixel 1-D kernel stacks that adaptively filter the two predicted frames
via :func:`vfi_tpu.ops.sepconv`.

Behavioral reference: src/models/tai/tai.py:123-347 (TAI, with a constant
"ratio" plane injected at decoder block ``rc_loc=4``) and
src/models/twi/twi.py:126-231 (TWI, identical but without ratio injection).

Reference quirks preserved deliberately:
  * With ``num_block=4`` (the color configuration) the decoder has only 3
    blocks, so the ratio plane at index ``rc_loc-1 == 3`` is never injected —
    TAI_color is effectively time-unaware inside the kernel net
    (tai.py:205-217 loop bound vs. rc_loc).
  * The reference computes a full-resolution ``merge_residual1`` whose output
    is never consumed by the decoder (tai.py:93 vs. the skip indices at
    tai.py:226: only merged res2/res3 are read).  We skip that dead compute —
    it is one of the most expensive convs in the model and has zero effect.

TPU-first deviation: the per-timestep Python loop of the reference
(tai.py:91-105) is vectorized away — callers fold T into the batch dimension
and pass a per-element ratio vector, so the whole blend is one big batched
program (MXU-friendly).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.image import upsample2x_bilinear
from ..ops.sepconv import pad_for_sepconv, sepconv
from .layers import Conv, ConvBlock, avg_pool2


class KernelHead(nn.Module):
    """1-D kernel generator: convs -> relu -> 2x bilinear upsample -> conv.

    Reference: create_1d_kernel_generator_block (tai.py:266-286).
    Output: ``[B, H, W, ks]`` (kernels on the channel/lane axis).
    """

    kf_dim: int
    ks: int
    layers: int
    align_corners: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(Conv(self.kf_dim * 2, 3, name=f"conv{i}")(x))
        x = nn.relu(Conv(self.ks, 3, name="to_ks")(x))
        x = upsample2x_bilinear(x, self.align_corners)
        return Conv(self.ks, 3, name="post_up")(x)


class KernelNet(nn.Module):
    """Shared TAI/TWI U-Net + four kernel heads + the two sepconv applications.

    :param use_ratio: True for TAI (inject the time plane), False for TWI.
    """

    gf_dim: int
    ks: int
    num_block: int = 5
    layers: int = 3
    kf_dim: int = 32
    use_ratio: bool = True
    rc_loc: int = 4
    sepconv_impl: str | None = None
    # Corner-aligned 2x upsampling matches the reference's torch-0.3
    # nn.Upsample bit-for-bit (needed for imported-checkpoint parity);
    # half-pixel (False) is marginally cheaper but numerically different.
    align_corners: bool = True

    @nn.compact
    def __call__(self, frame1, frame2, dyn1, dyn2, cont1, cont2, merged_res2, merged_res3, ratio):
        """
        :param frame1/frame2: the forward/backward predicted frames [B, H, W, C]
        :param dyn1/dyn2, cont1/cont2: motion/content encodings [B, H/8, W/8, 4g]
        :param merged_res2: merged residual at H/2 [B, H/2, W/2, kf*2]
        :param merged_res3: merged residual at H/4 [B, H/4, W/4, kf*4]
        :param ratio: per-batch-element time ratio [B] (ignored unless use_ratio)
        :return: (dot1, dot2) — the two adaptively filtered frames [B, H, W, C]
        """
        nb, kf = self.num_block, self.kf_dim
        assert nb >= 4, f"num_block must be >= 4, got {nb}"

        x = jnp.concatenate([dyn1, dyn2, cont1, cont2], axis=-1)

        # Encoder chain: blocks i = 3 .. nb-1, widths kf * 2^i, avg-pooled
        # (reference create_encoder_blocks, tai.py:289-310).
        enc = []
        for i in range(3, nb):
            x = ConvBlock(kf * (2**i), self.layers, name=f"enc{i}")(x)
            enc.append(x)
            x = avg_pool2(x)

        # Decoder chain: nb-1 blocks (reference create_decoder_blocks,
        # tai.py:313-347, and the skip wiring in tai.py:201-226).
        ndec = nb - 1
        for i in range(ndec):
            c_out = kf * (2 ** (ndec - i))
            x = ConvBlock(c_out, self.layers, name=f"dec{i}")(x)
            if self.use_ratio and i == self.rc_loc - 1:
                plane = jnp.broadcast_to(
                    ratio[:, None, None, None].astype(x.dtype), (*x.shape[:3], 1)
                )
                x = jnp.concatenate([x, plane], axis=-1)
            x = upsample2x_bilinear(x, self.align_corners)
            x = nn.relu(Conv(c_out, 3, name=f"up{i}")(x))
            if i < nb - 3:
                x = x + enc[nb - 3 - i - 1]
            elif i == nb - 3:
                x = x + merged_res3
            else:  # i == nb - 2
                x = x + merged_res2

        ac = self.align_corners
        v1 = KernelHead(kf, self.ks, self.layers, ac, name="vertical1")(x)
        v2 = KernelHead(kf, self.ks, self.layers, ac, name="vertical2")(x)
        h1 = KernelHead(kf, self.ks, self.layers, ac, name="horizontal1")(x)
        h2 = KernelHead(kf, self.ks, self.layers, ac, name="horizontal2")(x)

        dot1 = sepconv(pad_for_sepconv(frame1, self.ks), v1, h1, impl=self.sepconv_impl)
        dot2 = sepconv(pad_for_sepconv(frame2, self.ks), v2, h2, impl=self.sepconv_impl)
        return dot1, dot2
