"""Llama forward with fused Pallas attention vs the eager quantized path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.models.common import supports_fused_attention


def _q(width, block, skip):
    return {
        "name": "block_fp", "width": width, "exponent_width": 8,
        "exponent_bias": None, "block_size": block, "skip_first_dim": skip,
    }


Q_CONFIG = {
    "linear": {
        "name": "flexible_lqer", "is_ptq": True,
        "x_quantizer": _q(8, [1, 16], True),
        "w_quantizer": _q(4, [1, 16], False),
        "b_quantizer": _q(8, [1, 16], False),
    },
    "matmul": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
               "w_quantizer": _q(8, [1, 16], True)},
}
L_CONFIG = {"linear": {"rank": 8}}


@pytest.mark.slow
def test_fused_attention_forward_matches_eager():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=2, heads=2,
                           kv_heads=2, inter=96, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    params = models.prepare_ptq(params, cfg, qcfgs)
    assert supports_fused_attention(qcfgs[0]["attn"])

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 128)
    ref = np.asarray(models.forward(params, ids, cfg, qcfgs))
    out = np.asarray(
        models.get_arch_module(cfg).forward(
            params, ids, cfg, qcfgs, fused_attention=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(out.argmax(-1), ref.argmax(-1))


def test_fused_attention_ineligible_configs_fall_back():
    # non-standard matmul quantization (width mismatch) must not be fused
    q_cfg = {
        "linear": Q_CONFIG["linear"],
        "matmul": {"name": "flexible", "x_quantizer": _q(6, [1, 16], True),
                   "w_quantizer": _q(8, [1, 16], True)},
    }
    cfg = LlamaConfig.tiny(vocab_size=64, hidden=32, layers=1, heads=2,
                           kv_heads=2, inter=48)
    qcfgs = models.quantize_model(cfg, q_cfg, L_CONFIG)
    assert not supports_fused_attention(qcfgs[0]["attn"])
    # forward with the flag simply falls back to eager (same result)
    params = models.init_params(cfg, jax.random.PRNGKey(2))
    params = models.prepare_ptq(params, cfg, qcfgs)
    ids = jnp.zeros((1, 16), jnp.int32)
    a = np.asarray(models.get_arch_module(cfg).forward(
        params, ids, cfg, qcfgs, fused_attention=True))
    b = np.asarray(models.forward(params, ids, cfg, qcfgs))
    np.testing.assert_array_equal(a, b)
