"""Emulated LLM.int8() / LLM.int4() linear (bitsandbytes semantics).

The reference's baseline table evaluates bitsandbytes ``load_in_8bit`` /
``load_in_4bit`` checkpoints through HF
(`/root/reference/experiments/baselines/baseline.py:93-109`); those CUDA
kernels have no TPU runtime and no checkpoint artifact to decode, so this
module computes the same math as a software emulation (exactly how the
reference emulates every OTHER format, SURVEY.md §0):

* **outlier decomposition**: activation columns whose ``|x|`` reaches
  ``threshold`` (default 6.0 — the same census the threshold profiler runs,
  `lqer_tpu/profiler/threshold.py`) stay fp and multiply the fp weight
  columns;
* **vector-wise quantization** of the remainder: per-activation-row absmax
  int8 (or int4) for X, per-output-row absmax for W; the int GEMM's result
  is exactly reproduced by the dequantize-then-matmul below.
"""

from __future__ import annotations

import jax.numpy as jnp


def llm_int_linear(
    x: jnp.ndarray,
    weight: jnp.ndarray,  # (out, in)
    bias: jnp.ndarray | None = None,
    *,
    bits: int = 8,
    threshold: float = 6.0,
) -> jnp.ndarray:
    """``Y = Xq_lo @ Wq^T + X_hi @ W^T (+ b)`` with dynamic outlier split."""
    qmax = 2.0 ** (bits - 1) - 1
    # outlier census over every leading dim (bitsandbytes: per forward)
    absx = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)))
    outlier = absx >= threshold  # (in,)
    x_hi = jnp.where(outlier, x, 0.0)
    x_lo = jnp.where(outlier, 0.0, x)

    # vector-wise absmax quantize-dequantize (fake-quant == int GEMM math)
    sx = jnp.max(jnp.abs(x_lo), axis=-1, keepdims=True) / qmax
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(x_lo / sx), -qmax, qmax) * sx
    sw = jnp.max(jnp.abs(weight), axis=-1, keepdims=True) / qmax
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(weight / sw), -qmax, qmax) * sw

    # x_hi is zero outside the outlier columns, so the fp product over the
    # full W equals the restricted outlier-column product
    y = jnp.matmul(xq, wq.T) + jnp.matmul(x_hi, weight.T)
    if bias is not None:
        y = y + bias
    return y
