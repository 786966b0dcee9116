from .quantizers import (
    block_fp_quantizer,
    get_quantizer,
    integer_fraction,
    integer_quantizer,
    make_quantizer,
    minifloat_denorm_quantizer,
    minifloat_ieee_quantizer,
    passthrough_quantizer,
)

__all__ = [
    "block_fp_quantizer",
    "integer_fraction",
    "integer_quantizer",
    "minifloat_denorm_quantizer",
    "minifloat_ieee_quantizer",
    "passthrough_quantizer",
    "get_quantizer",
    "make_quantizer",
]
