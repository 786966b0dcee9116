from .dequant_gemm import (
    prepare_w4_weights,
    qlinear_w4_fused,
    qlinear_w4_fused_emulation,
)

__all__ = [
    "prepare_w4_weights",
    "qlinear_w4_fused",
    "qlinear_w4_fused_emulation",
]
