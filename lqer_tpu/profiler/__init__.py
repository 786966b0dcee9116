from .scale import SCALE_CLAMP_MIN, ScaleAccumulator, batch_mean_abs_tap
from .threshold import ThresholdAccumulator, batch_threshold_tap

__all__ = [
    "SCALE_CLAMP_MIN",
    "ScaleAccumulator",
    "batch_mean_abs_tap",
    "ThresholdAccumulator",
    "batch_threshold_tap",
]
