"""Sequence-classification head over the quantized decoders."""

import numpy as np
import jax
import jax.numpy as jnp

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig, OPTConfig


def _q(width, block, skip):
    return {
        "name": "block_fp", "width": width, "exponent_width": 8,
        "exponent_bias": None, "block_size": block, "skip_first_dim": skip,
    }


Q_CONFIG = {
    "linear": {
        "name": "flexible", "is_ptq": True,
        "x_quantizer": _q(8, [1, 16], True),
        "w_quantizer": _q(4, [1, 16], False),
        "b_quantizer": _q(8, [1, 16], False),
    },
    "matmul": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
               "w_quantizer": _q(8, [1, 16], True)},
    "bmm": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
            "w_quantizer": _q(8, [1, 16], True)},
}


def test_llama_classification_last_nonpad_token():
    cfg = LlamaConfig.tiny(vocab_size=64, hidden=32, layers=1, heads=2,
                           kv_heads=2, inter=48)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    params["score.weight"] = jax.random.normal(jax.random.PRNGKey(1), (3, 32))

    pad = 0
    ids = jnp.asarray([[5, 9, 3, pad, pad], [7, pad, pad, pad, pad]],
                      dtype=jnp.int32)
    out = models.forward_sequence_classification(params, ids, cfg, None,
                                                 pad_token_id=pad)
    assert out.shape == (2, 3)

    # oracle: hidden state at the last non-pad position through score
    h = models.get_arch_module(cfg).forward(params, ids, cfg, None,
                                            return_hidden=True)
    ref0 = np.asarray(h[0, 2] @ params["score.weight"].T)
    ref1 = np.asarray(h[1, 0] @ params["score.weight"].T)
    np.testing.assert_allclose(np.asarray(out[0]), ref0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), ref1, atol=1e-6)


def test_opt_classification_quantized():
    cfg = OPTConfig.tiny(vocab_size=64, hidden=32, layers=1, heads=2, ffn=48)
    params = models.init_params(cfg, jax.random.PRNGKey(2))
    params["score.weight"] = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, None)
    params = models.prepare_ptq(params, cfg, qcfgs)
    ids = jnp.asarray([[5, 9, 3, 1, 1]], dtype=jnp.int32)  # pad_token_id=1
    out = models.forward_sequence_classification(params, ids, cfg, qcfgs)
    assert out.shape == (1, 2)
    assert bool(jnp.all(jnp.isfinite(out)))
