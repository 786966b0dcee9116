"""Activation-statistics calibration ("profiling" in the reference's sense).

Functional equivalent of the forward-hook profiler
(`/root/reference/src/lqer/statistic_profiler/scale.py:21-69`): per linear,
per input channel, ``scale = max over batches of mean_over_tokens(|x|)``;
finalized with ``clamp(1e-4)`` then ``scale / sqrt(scale.min()*scale.max())``.

JAX has no hooks — the model forward takes a ``tap(name, x)`` callback and the
per-batch reduction happens inside the jitted forward (the stats come back as
auxiliary outputs); the cross-batch running max is a tiny host-side update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SCALE_CLAMP_MIN = 1e-4  # `scale.py:3`


def batch_mean_abs_tap(stats: dict):
    """Build a tap that records per-channel mean |x| for this batch
    (`scale.py:32-40`: ``x.abs().view(-1, in_features).mean(0)``)."""

    def tap(name: str, x: jnp.ndarray):
        xf = jnp.abs(x.astype(jnp.float32))
        stats[name + ".scale"] = jnp.mean(xf.reshape(-1, x.shape[-1]), axis=0)

    return tap


def make_profiled_forward(forward_fn):
    """Wrap a forward fn into one returning ``(logits, stats)``."""

    def profiled(params, input_ids):
        stats: dict = {}
        logits = forward_fn(params, input_ids, tap=batch_mean_abs_tap(stats))
        return logits, stats

    return profiled


class ScaleAccumulator:
    """Running max across calibration batches + finalize
    (`scale.py:38,44-51`)."""

    def __init__(self):
        self.scales: dict[str, jnp.ndarray] = {}

    def update(self, batch_stats: dict) -> None:
        for name, s in batch_stats.items():
            if name in self.scales:
                self.scales[name] = jnp.maximum(self.scales[name], s)
            else:
                self.scales[name] = s

    def finalize(self) -> dict[str, jax.Array]:
        out = {}
        for name, scale in self.scales.items():
            scale = jnp.clip(scale, min=SCALE_CLAMP_MIN)
            scale = scale / jnp.sqrt(jnp.min(scale) * jnp.max(scale))
            out[name] = scale
        return out
