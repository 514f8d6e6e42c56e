from .fill_in import (  # noqa: F401
    BidirectionalSimpleAverageFillInModel,
    BidirectionalTimeWeightedAverageFillInModel,
    MCNetFillInModel,
    TAIFillInModel,
    TimeWeightedPFFillInModel,
    TWIFillInModel,
)
from .registry import create_model, model_keys  # noqa: F401

# Reference-compatible alias (create_model.py:75-78 registers TWI under this name).
TimeWeightedInterpolationFillInModel = TWIFillInModel


def __getattr__(name):
    # Lazy imports so the heavy/optional families don't load unless used.
    if name == "SloMoFillInModel":
        from .slomo import SloMoFillInModel

        return SloMoFillInModel
    if name == "OFFillInModel":
        from .optical_flow import OFFillInModel

        return OFFillInModel
    if name in ("SCTSkipConFillInModel", "SCTSuperSkipConFillInModel"):
        from . import legacy_sct

        return getattr(legacy_sct, name)
    if name.startswith("SCT"):
        from . import sct

        return getattr(sct, name)
    raise AttributeError(name)
