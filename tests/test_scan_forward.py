"""lax.scan layer-loop forward must match the unrolled forward exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.models.llama import forward_scan, stack_layer_params


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


def test_scan_matches_unrolled_fp():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=3, heads=4,
                           kv_heads=2, inter=96)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    ref = np.asarray(models.forward(params, ids, cfg, None))
    out = np.asarray(forward_scan(params, ids, cfg, None))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_scan_matches_unrolled_quantized_lqer():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=3, heads=4,
                           kv_heads=2, inter=96)
    params = models.init_params(cfg, jax.random.PRNGKey(2))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    params = models.prepare_ptq(params, cfg, qcfgs)
    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            out_dim, in_dim = params[prefix + ".weight"].shape
            params[prefix + ".A"] = (
                jax.random.normal(jax.random.PRNGKey(i), (in_dim, 8)) * 0.01
            )
            params[prefix + ".B"] = (
                jax.random.normal(jax.random.PRNGKey(i + 5), (8, out_dim)) * 0.01
            )
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 128)
    ref = np.asarray(models.forward(params, ids, cfg, qcfgs))
    # uniform per-layer config -> scan valid with layer 0's resolved config
    stacked, rest = stack_layer_params(params, cfg)
    out = np.asarray(
        jax.jit(lambda: forward_scan(params, ids, cfg, qcfgs[0],
                                     stacked=stacked, rest=rest))()
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
