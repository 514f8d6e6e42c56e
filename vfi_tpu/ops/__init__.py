from .sepconv import sepconv, sepconv_direct, sepconv_mxu, sepconv_pallas, pad_for_sepconv  # noqa: F401
