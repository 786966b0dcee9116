"""Emulated LLM.int8()/int4() linear (bitsandbytes semantics) — the baseline
row the reference gets from `load_in_8bit`/`load_in_4bit`
(`/root/reference/experiments/baselines/baseline.py:93-109`)."""

import numpy as np
import jax
import jax.numpy as jnp

from lqer_tpu.ops.llm_int8 import llm_int_linear
from lqer_tpu.ops.qlinear import QLinearConfig, qlinear


def test_outlier_columns_stay_fp():
    """Columns over the threshold multiply the fp weights exactly."""
    rng = np.random.RandomState(0)
    x = rng.randn(4, 32).astype(np.float32)
    x[:, 3] = 50.0  # a guaranteed outlier column
    w = rng.randn(16, 32).astype(np.float32) * 0.1
    y = np.asarray(llm_int_linear(jnp.asarray(x), jnp.asarray(w)))
    # zero out everything except the outlier column: its contribution must
    # be the exact fp product
    x_hi = np.zeros_like(x)
    x_hi[:, 3] = x[:, 3]
    x_lo = x.copy()
    x_lo[:, 3] = 0.0
    y_lo = np.asarray(llm_int_linear(jnp.asarray(x_lo), jnp.asarray(w)))
    np.testing.assert_allclose(y - y_lo, x_hi @ w.T, rtol=1e-5, atol=1e-5)


def test_vector_wise_quantization_math():
    """No outliers: result equals the dequantized int GEMM computed by hand."""
    rng = np.random.RandomState(1)
    x = (rng.randn(3, 16) * 0.5).astype(np.float32)
    w = (rng.randn(8, 16) * 0.2).astype(np.float32)
    bias = rng.randn(8).astype(np.float32)
    for bits in (8, 4):
        qmax = 2.0 ** (bits - 1) - 1
        sx = np.abs(x).max(axis=1, keepdims=True) / qmax
        xq = np.clip(np.round(x / sx), -qmax, qmax)
        sw = np.abs(w).max(axis=1, keepdims=True) / qmax
        wq = np.clip(np.round(w / sw), -qmax, qmax)
        expect = (xq @ wq.T) * (sx * sw.T) + bias
        got = np.asarray(llm_int_linear(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), bits=bits))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_int4_coarser_than_int8():
    rng = np.random.RandomState(2)
    x = (rng.randn(8, 64) * 0.5).astype(np.float32)
    w = (rng.randn(32, 64) * 0.2).astype(np.float32)
    exact = x @ w.T
    e8 = np.abs(np.asarray(llm_int_linear(
        jnp.asarray(x), jnp.asarray(w), bits=8)) - exact).mean()
    e4 = np.abs(np.asarray(llm_int_linear(
        jnp.asarray(x), jnp.asarray(w), bits=4)) - exact).mean()
    assert 0 < e8 < e4


def test_qlinear_llm_int8_mode():
    """q_config {"name": "llm_int8"} routes qlinear through the emulation."""
    cfg = QLinearConfig.from_q_config({"name": "llm_int8", "threshold": 6.0})
    assert cfg.mode == "llm_int8" and not cfg.is_ptq and cfg.int_bits == 8
    cfg4 = QLinearConfig.from_q_config({"name": "llm_int4"})
    assert cfg4.int_bits == 4

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(16, 32) * 0.1).astype(np.float32))
    got = qlinear(x, {"weight": w}, cfg)
    expect = llm_int_linear(x, w, bits=8, threshold=6.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_baselines_llm_int8_forward_end_to_end():
    """Full tiny-model forward through the baseline qcfg builder — the
    offline stand-in for `baselines.py --method llm_int8` ppl."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from experiments.baselines import build_llm_int_qcfgs
    from lqer_tpu import models
    from lqer_tpu.models import OPTConfig

    cfg = OPTConfig.tiny(vocab_size=64, hidden=32, layers=2, heads=2, ffn=48)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    qcfgs = build_llm_int_qcfgs(cfg, "llm_int8", 6.0)
    ids = jnp.asarray(np.random.RandomState(5).randint(0, 64, (2, 8)))
    logits = models.forward(params, ids, cfg, qcfgs)
    assert logits.shape == (2, 8, 64)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # int8 emulation must differ from fp but stay close on this tiny model
    fp = models.forward(params, ids, cfg, None)
    diff = float(jnp.abs(logits - fp).max())
    assert 0 < diff < 1.0, diff
