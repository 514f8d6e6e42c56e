"""Model registry: reference-compatible `model_key` strings -> constructors.

Key surface preserved verbatim from src/models/create_model.py:19-101, plus
the JSON file / JSON literal fallback (create_model.py:88-111,
models_as_files/example.json).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict

from .fill_in import (
    BidirectionalSimpleAverageFillInModel,
    BidirectionalTimeWeightedAverageFillInModel,
    MCNetFillInModel,
    TAIFillInModel,
    TimeWeightedPFFillInModel,
    TWIFillInModel,
)


def _tai(c_dim, num_block):
    return TAIFillInModel(gf_dim=64, c_dim=c_dim, feature_size=3, ks=51, num_block=num_block)


def _twi(c_dim, num_block):
    return TWIFillInModel(gf_dim=64, c_dim=c_dim, feature_size=3, ks=51, num_block=num_block)


def _sct(cls_name):
    def make(c_dim):
        from .sct import SCT_CLASSES

        return SCT_CLASSES[cls_name](c_dim=c_dim, num_blocks=2, num_heads=3, d_v=256, d_ff=2048)

    return make


def _slomo(c_dim):
    from .slomo import SloMoFillInModel

    return SloMoFillInModel(base_dim=32, c_dim=c_dim)


def _of():
    from .optical_flow import OFFillInModel

    return OFFillInModel()


_REGISTRY: Dict[str, Callable[[], Any]] = {
    "TAI_gray": lambda: _tai(1, 5),
    "TAI_color": lambda: _tai(3, 4),
    "OFFillInModel": _of,
    "MCNet_gray": lambda: MCNetFillInModel(gf_dim=64, c_dim=1, feature_size=3),
    "MCNet_color": lambda: MCNetFillInModel(gf_dim=64, c_dim=3, feature_size=3),
    "SloMoFillInModel_color": lambda: _slomo(3),
    "SloMoFillInModel_gray": lambda: _slomo(1),
    "TimeWeightedInterpolationFillInModel_gray": lambda: _twi(1, 5),
    "TimeWeightedInterpolationFillInModel_color": lambda: _twi(3, 4),
    "BidirectionalSimpleAverageFillInModel_gray": lambda: BidirectionalSimpleAverageFillInModel(
        gf_dim=64, c_dim=1, feature_size=3
    ),
    "BidirectionalSimpleAverageFillInModel_color": lambda: BidirectionalSimpleAverageFillInModel(
        gf_dim=64, c_dim=3, feature_size=3
    ),
    "BidirectionalTimeWeightedAverageFillInModel_gray": lambda: BidirectionalTimeWeightedAverageFillInModel(
        gf_dim=64, c_dim=1, feature_size=3
    ),
    "BidirectionalTimeWeightedAverageFillInModel_color": lambda: BidirectionalTimeWeightedAverageFillInModel(
        gf_dim=64, c_dim=3, feature_size=3
    ),
    "TimeWeightedPFFillInModel": lambda: TimeWeightedPFFillInModel(),
}

# The SCT conv-transformer family (reference create_model.py:37-68): every
# variant exists in _gray (c_dim=1) and _color (c_dim=3) flavors.
for _name in (
    "SCTSkipConScaledTForward",
    "SCTSkipConScaledTInward",
    "SCTSkipConScaledTRandom",
    "SCTSkipConScaledTRandomB",
    "SCTSkipConScaledTRandomC",
    "SCTSkipConScaledTRandomD",
    "SCTBypassScaledTForward",
    "SCTFrameEncDecBNSkipConScaledTForward",
):
    for _cd, _suffix in ((1, "_gray"), (3, "_color")):
        _REGISTRY[_name + _suffix] = (lambda n=_name, c=_cd: _sct(n)(c))


def model_keys() -> list[str]:
    return sorted(_REGISTRY)


def create_model(model_key: str):
    """Build a model from a registry key, a JSON file path, or a JSON literal."""
    if model_key in _REGISTRY:
        return _REGISTRY[model_key]()

    if os.path.isfile(model_key):
        with open(model_key) as f:
            return _construct_from_dict(json.load(f))

    try:
        info = json.loads(model_key)
    except ValueError:
        raise KeyError(
            f"Unknown model key {model_key!r}; not a registry key, file, or JSON literal. "
            f"Known keys: {model_keys()}"
        )
    return _construct_from_dict(info)


def _construct_from_dict(info: dict):
    """JSON spec: {"class": name, "args": [...], "kwargs": {...}} —
    same schema as the reference (models_as_files/example.json)."""
    assert isinstance(info.get("class"), str)
    assert isinstance(info.get("args"), list)
    assert isinstance(info.get("kwargs"), dict)
    import vfi_tpu.models as M

    cls = getattr(M, info["class"])
    return cls(*info["args"], **info["kwargs"])
