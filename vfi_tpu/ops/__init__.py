from .sepconv import (  # noqa: F401
    pad_for_sepconv,
    sepconv,
    sepconv_direct,
    sepconv_mxu,
    sepconv_pallas,
    sepconv_pallas_mxu,
)
