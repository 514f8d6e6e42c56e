"""VGG16 feature extractor for the SloMo perceptual loss.

The reference uses torchvision's pretrained VGG16 up to relu4_3
(``features[:22]``, environments.py:541-544).  Pretrained weights cannot be
downloaded in an offline TPU environment, so this module:
  * defines the conv stack (conv1_1 .. conv4_3, ReLU after each, maxpool
    between stages) in flax;
  * loads weights from an ``.npz`` file (keys ``convN_M/kernel`` [HWIO] and
    ``convN_M/bias``) when provided — see cli/convert_vgg16.py for converting
    a torchvision state_dict;
  * with no path configured, reports itself unavailable; SloMoEnvironment
    hard-errors in that case unless lambda_p == 0 was explicitly requested.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# (stage, layer) conv widths for conv1_1 .. conv4_3
_CFG = [(64, 2), (128, 2), (256, 3), (512, 3)]


class VGG16Features(nn.Module):
    """Outputs relu4_3 features of a [B, H, W, 3] image in [0, 1]-ish range."""

    @nn.compact
    def __call__(self, x):
        # torchvision normalization; input expected in [0, 1]
        mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
        x = (x - mean) / std
        for si, (width, layers) in enumerate(_CFG):
            for li in range(layers):
                x = nn.Conv(width, (3, 3), padding="SAME", name=f"conv{si + 1}_{li + 1}")(x)
                x = nn.relu(x)
            if si < len(_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def load_vgg16_params(npz_path: str) -> dict:
    data = np.load(npz_path)
    params = {}
    for si, (width, layers) in enumerate(_CFG):
        for li in range(layers):
            name = f"conv{si + 1}_{li + 1}"
            params[name] = {
                "kernel": jnp.asarray(data[f"{name}/kernel"]),
                "bias": jnp.asarray(data[f"{name}/bias"]),
            }
    return params


def try_load_vgg16(npz_path: Optional[str]):
    """Returns (apply_fn, params), or None when no path was given.

    A path that is given but unloadable is a hard error: silently dropping
    the perceptual term would train a SloMo that cannot reproduce the
    reference (environments.py:541-544 always constructs the VGG16 head).
    """
    if not npz_path:
        return None
    try:
        params = load_vgg16_params(npz_path)
    except (OSError, KeyError, ValueError) as e:
        raise RuntimeError(
            f"could not load VGG16 weights from {npz_path}: {e}. "
            "Convert a torchvision vgg16 state_dict with cli/convert_vgg16.py."
        ) from e
    model = VGG16Features()
    return model, {"params": params}
