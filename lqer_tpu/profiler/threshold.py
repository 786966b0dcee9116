"""LLM.int8()-style outlier census.

Functional equivalent of
`/root/reference/src/lqer/statistic_profiler/threshold.py:5-96`: per linear,
count activation columns where any |x| >= threshold (default 6.0); derive
high/low-precision sub-matrix shapes for the hardware-area study
(`experiments/hw_performance/profile_llm_int8.py:73-77`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def batch_threshold_tap(stats: dict, threshold: float):
    """Tap recording the per-batch count of high-precision columns
    (`threshold.py:38-44`)."""

    def tap(name: str, x: jnp.ndarray):
        is_large = jnp.abs(x) >= threshold
        n_cols = jnp.sum(jnp.any(is_large.reshape(-1, x.shape[-1]), axis=0))
        stats[name + ".threshold"] = n_cols

    return tap


class ThresholdAccumulator:
    """Collect per-batch column counts; finalize into the shape report
    (`threshold.py:53-79`)."""

    def __init__(self, threshold: float, seq_len: int):
        self.threshold = threshold
        self.seq_len = seq_len
        self.counts: dict[str, list[int]] = {}
        self.weight_shapes: dict[str, tuple[int, int]] = {}

    def register(self, name: str, out_features: int, in_features: int) -> None:
        self.weight_shapes[name + ".threshold"] = (out_features, in_features)

    def update(self, batch_stats: dict) -> None:
        for name, n in batch_stats.items():
            self.counts.setdefault(name, []).append(int(n))

    def finalize(self) -> dict[str, dict]:
        results = {}
        for name, counts in self.counts.items():
            x_n_cols_hp = math.ceil(sum(counts) / len(counts))
            w_shape = self.weight_shapes.get(name)
            result = {
                "weight_shape": w_shape,
                "threshold": self.threshold,
                "seq_len": self.seq_len,
                "num_activation_columns_in_high_precision": x_n_cols_hp,
                "high_precision_activation_shape": (self.seq_len, x_n_cols_hp),
            }
            if w_shape is not None:
                result["high_precision_weight_shape"] = (w_shape[0], x_n_cols_hp)
                result["low_precision_weight_shape"] = (
                    w_shape[0],
                    w_shape[1] - x_n_cols_hp,
                )
                result["low_precision_activation_shape"] = (
                    self.seq_len,
                    w_shape[1] - x_n_cols_hp,
                )
            results[name] = result
        return results
