"""Tests for the API-parity registries, wandb no-op shim, and baselines CLI
glue."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqer_tpu.ops.registry import get_quantized_func, get_quantized_layer_cls
from lqer_tpu.ops.qlinear import qlinear, QLinearConfig
from lqer_tpu.utils import wandb_compat


def _q(width, block, skip):
    return {
        "name": "block_fp", "width": width, "exponent_width": 8,
        "exponent_bias": None, "block_size": block, "skip_first_dim": skip,
    }


def test_get_quantized_layer_cls_flexible():
    q_config = {
        "name": "flexible", "is_ptq": False,
        "x_quantizer": _q(8, [1, 16], True),
        "w_quantizer": _q(4, [1, 16], False),
        "b_quantizer": _q(8, [1, 16], False),
    }
    build = get_quantized_layer_cls("linear", q_config)
    apply_fn, cfg = build(None)
    assert isinstance(cfg, QLinearConfig) and not cfg.is_lqer

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 32))
    w = jax.random.normal(jax.random.PRNGKey(1), (16, 32)) * 0.1
    params = {"weight": w, "bias": None}
    out = apply_fn(x, params)
    ref = qlinear(x, params, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_get_quantized_func_matches_manual():
    q_config = {
        "name": "flexible",
        "x_quantizer": _q(8, [1, 16], True),
        "w_quantizer": _q(8, [1, 16], True),
    }
    fn = get_quantized_func("matmul", q_config)
    a = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 16))
    b = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 8))
    out = np.asarray(fn(a, b))
    from lqer_tpu.ops import make_quantizer

    xq = make_quantizer(q_config["x_quantizer"])
    wq = make_quantizer(q_config["w_quantizer"])
    ref = np.asarray(jnp.matmul(xq(a), wq(b)))
    np.testing.assert_allclose(out, ref)


def test_get_quantized_func_rejects_unknown():
    with pytest.raises(ValueError):
        get_quantized_func("conv", {})
    with pytest.raises(ValueError):
        get_quantized_layer_cls("linear", {"name": "nope"})


def test_wandb_noop_without_wandb():
    # must not raise regardless of wandb availability
    run = wandb_compat.maybe_init({"enable_wandb": True, "wandb": {}}, "test")
    wandb_compat.log_table("t", [{"a": 1}])
    wandb_compat.log_summary(x=1.0)
    wandb_compat.finish()
    if not wandb_compat.HAS_WANDB:
        assert run is None
