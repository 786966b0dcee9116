"""Packed-W8 lm_head (serving opt-in, VERDICT r4 #2c): tile layout, kernel
parity vs the dequantize-then-dot oracle, and engine integration on both
the unrolled and scan paths."""

import jax
import jax.numpy as jnp
import numpy as np

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.ops.pallas.dequant_gemm import (
    prepare_w4_weights,
    qlinear_w4_fused,
)
from lqer_tpu.ops.storage import MXINT8, dequantize_mx, quantize_mx
from lqer_tpu.serving import DecodeEngine, Request


def test_w8_tiles_dot_matches_oracle():
    w = jax.random.normal(jax.random.PRNGKey(0), (512, 256)) * 0.02  # (V, K)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 256)).astype(jnp.bfloat16)
    prep = prepare_w4_weights(w, fmt=MXINT8, tile_k=128, tile_n=128)
    y = qlinear_w4_fused(x, prep, quant_xa_width=None, quant_out_width=None,
                         interpret=True)
    codes, exps = quantize_mx(jnp.asarray(w, jnp.float32).T, MXINT8)
    wd = dequantize_mx(codes, exps, MXINT8, jnp.bfloat16)
    ref = jnp.dot(x.astype(jnp.float32), wd.astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


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


def test_engine_w8_lm_head_both_paths():
    """lm_head_width=8 engages the packed head on the unrolled AND scan
    engines; tokens agree between the two (same W8 grid both ways) and the
    logits stay within the W8 weight-grid error of the dense head."""
    from lqer_tpu.serving.pallas_backend import prepare_serving_params

    cfg = LlamaConfig.tiny(vocab_size=256, hidden=128, layers=2, heads=4,
                           kv_heads=2, inter=256, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(3))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, {"linear": {"rank": 16}})
    backend = prepare_serving_params(params, cfg, qcfgs)
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(scan, width):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=64,
                           cache_dtype="mxint8",
                           pallas_backend={"arrays": dict(backend["arrays"]),
                                           "meta": dict(backend["meta"])},
                           scan_layers=scan, lm_head_width=width)
        if width is not None and scan:
            assert "lm_head" in eng._bs_meta  # survived stack_backend
        reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=4),
                Request(prompt_ids=[5, 6], max_new_tokens=3)]
        eng.run(reqs)
        return [r.output_ids for r in reqs]

    w8_unrolled = run(False, 8)
    w8_scan = run(True, 8)
    assert w8_unrolled == w8_scan, (w8_unrolled, w8_scan)


def test_model_step_w8_head_logits_close_to_dense():
    from lqer_tpu.serving import decode as dec
    from lqer_tpu.serving.pallas_backend import (
        pack_lm_head,
        prepare_serving_params,
    )

    cfg = LlamaConfig.tiny(vocab_size=256, hidden=128, layers=1, heads=4,
                           kv_heads=2, inter=256, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(4))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, {"linear": {"rank": 16}})
    backend = prepare_serving_params(params, cfg, qcfgs)
    params = models.prepare_ptq(params, cfg, qcfgs)
    ids = jnp.array([[5, 7, 11, 13]])
    pos = jnp.zeros((1,), jnp.int32)

    cache = dec.make_cache(cfg, 1, 64, "mxint8")
    dense, _ = dec.model_step(params, ids, cache, pos, cfg, qcfgs,
                              backend=backend)
    packed = pack_lm_head({"arrays": dict(backend["arrays"]),
                           "meta": dict(backend["meta"])}, params, width=8)
    cache = dec.make_cache(cfg, 1, 64, "mxint8")
    w8, _ = dec.model_step(params, ids, cache, pos, cfg, qcfgs,
                           backend=packed)
    d = np.asarray(dense, np.float32)
    w = np.asarray(w8, np.float32)
    # W8 weight grid: ~2^-7 relative per-element weight error, accumulated
    # over K=128 — loose bound, but catches wiring errors outright
    np.testing.assert_allclose(w, d, atol=0.35, rtol=0.25)
    assert not np.array_equal(w, d)  # the grid actually changed
