"""Scan-based decode step vs the unrolled decode: identical tokens in the
engine, for both the emulated and Pallas-backend paths."""

import jax
import jax.numpy as jnp
import pytest

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.serving import DecodeEngine, Request
from lqer_tpu.serving.pallas_backend import prepare_serving_params


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


def _run_engine(params, cfg, qcfgs, backend, scan):
    eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=64,
                       cache_dtype=jnp.float32, pallas_backend=backend,
                       scan_layers=scan)
    reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=4),
            Request(prompt_ids=[5, 6], max_new_tokens=3)]
    eng.run(reqs)
    return [r.output_ids for r in reqs]


def test_scan_decode_matches_unrolled_emulated():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=3, heads=4,
                           kv_heads=2, inter=96)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    params = models.prepare_ptq(params, cfg, qcfgs)
    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            od, idim = params[prefix + ".weight"].shape
            params[prefix + ".A"] = jnp.zeros((idim, 8))
            params[prefix + ".B"] = jax.random.normal(
                jax.random.PRNGKey(i), (8, od)) * 0.01

    unrolled = _run_engine(params, cfg, qcfgs, None, scan=False)
    scanned = _run_engine(params, cfg, qcfgs, None, scan=True)
    assert scanned == unrolled, (scanned, unrolled)


def test_scan_decode_matches_unrolled_pallas():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=2, heads=4,
                           kv_heads=2, inter=256, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(1))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    backend = prepare_serving_params(params, cfg, qcfgs)
    params = models.prepare_ptq(params, cfg, qcfgs)

    unrolled = _run_engine(params, cfg, qcfgs, backend, scan=False)
    scanned = _run_engine(params, cfg, qcfgs, backend, scan=True)
    assert scanned == unrolled, (scanned, unrolled)


def test_scan_decode_quantized_cache_matches_unrolled():
    """MXINT8 KV cache threads through the scan (codes/exps as xs→ys) and
    must reproduce the unrolled quantized-cache engine exactly."""
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=3, heads=4,
                           kv_heads=2, inter=96)
    params = models.init_params(cfg, jax.random.PRNGKey(2))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(scan):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=64,
                           cache_dtype="mxint8", scan_layers=scan)
        reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=4),
                Request(prompt_ids=[5, 6], max_new_tokens=3)]
        eng.run(reqs)
        return [r.output_ids for r in reqs]

    assert run(True) == run(False)


def test_scan_decode_fused_write_attend_matches_unrolled():
    """max_len % 128 == 0 + quantized cache + Pallas backend engages the
    single-launch insert+attend kernel (`_fused_write_attend`) in the scan
    body; tokens must match the unrolled engine (two-launch write-then-
    attend path) exactly."""
    from lqer_tpu.serving import decode as dec
    from lqer_tpu.ops.pallas import decode_attention as da

    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=2, heads=4,
                           kv_heads=2, inter=256, max_pos=128)
    params = models.init_params(cfg, jax.random.PRNGKey(3))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    backend = prepare_serving_params(params, cfg, qcfgs)
    params = models.prepare_ptq(params, cfg, qcfgs)

    calls = []
    orig = da.decode_attention_quantized_write

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    def run(scan):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=128,
                           cache_dtype="mxint8", pallas_backend=backend,
                           scan_layers=scan)
        reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=4),
                Request(prompt_ids=[5, 6], max_new_tokens=3)]
        eng.run(reqs)
        return [r.output_ids for r in reqs]

    del dec  # the scan body imports the kernel from `da` at call time
    da.decode_attention_quantized_write = spy
    try:
        scanned = run(True)
    finally:
        da.decode_attention_quantized_write = orig
    assert calls, "fused write+attend kernel did not engage"
    unrolled = run(False)
    assert scanned == unrolled, (scanned, unrolled)


OPT_Q_CONFIG = {
    "linear": Q_CONFIG["linear"],
    "bmm": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
            "w_quantizer": _q(8, [1, 16], True)},
}


@pytest.mark.slow
def test_opt_scan_decode_matches_unrolled():
    from lqer_tpu.models import OPTConfig

    cfg = OPTConfig.tiny(vocab_size=128, hidden=64, layers=3, heads=4,
                         ffn=96, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(3))
    qcfgs = models.quantize_model(cfg, OPT_Q_CONFIG, L_CONFIG)
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(scan, cache_dtype=jnp.float32):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=64,
                           cache_dtype=cache_dtype, scan_layers=scan)
        reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=4),
                Request(prompt_ids=[5, 6], max_new_tokens=3)]
        eng.run(reqs)
        return [r.output_ids for r in reqs]

    unrolled = run(False)
    assert run(True) == unrolled
    # quantized cache variant agrees between scan and unrolled too
    assert run(True, "mxint8") == run(False, "mxint8")


@pytest.mark.slow
def test_opt_scan_decode_matches_unrolled_pallas():
    from lqer_tpu.models import OPTConfig

    cfg = OPTConfig.tiny(vocab_size=128, hidden=256, layers=2, heads=4,
                         ffn=256, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(4))
    qcfgs = models.quantize_model(cfg, OPT_Q_CONFIG, L_CONFIG)
    backend = prepare_serving_params(params, cfg, qcfgs)
    # OPT fuses qkv only (fc1/fc2 have different inputs)
    assert "model.decoder.layers.0.self_attn.qkv_proj" in backend["meta"]
    params = models.prepare_ptq(params, cfg, qcfgs)

    unrolled = _run_engine(params, cfg, qcfgs, backend, scan=False)
    scanned = _run_engine(params, cfg, qcfgs, backend, scan=True)
    assert scanned == unrolled, (scanned, unrolled)


def test_scan_heterogeneous_configs_match_unrolled():
    """Heterogeneous per-layer configs (the reference's model_layer_{i}
    mixed-precision surface, `llama_decoder.py:423-482`): the scan engine
    splits the layer loop into config segments and must emit exactly the
    unrolled engine's tokens — round 1 rejected this case outright."""
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=3, heads=4,
                           kv_heads=2, inter=96)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    # model_layer_{i} overrides REPLACE the whole layer template
    # (`llama_decoder.py:444-452` semantics): build a full layer dict with
    # one projection at a different activation width
    lin6 = {**Q_CONFIG["linear"], "x_quantizer": _q(6, [1, 16], True)}
    mm = Q_CONFIG["matmul"]
    q_het = dict(Q_CONFIG)
    q_het["model_layer_1"] = {
        "self_attn": {
            "q_proj": lin6, "k_proj": Q_CONFIG["linear"],
            "v_proj": Q_CONFIG["linear"], "o_proj": Q_CONFIG["linear"],
            "matmul_0": mm, "matmul_1": mm,
        },
        "mlp": {p: Q_CONFIG["linear"]
                for p in ("gate_proj", "up_proj", "down_proj")},
    }
    qcfgs = models.quantize_model(cfg, q_het, L_CONFIG)
    from lqer_tpu.models.config_expand import layer_qcfg_segments

    assert len(layer_qcfg_segments(qcfgs, cfg.num_hidden_layers)) == 3
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(scan):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=1, max_len=64,
                           cache_dtype=jnp.float32, scan_layers=scan)
        req = Request(prompt_ids=[3, 9, 27], max_new_tokens=4)
        eng.run([req])
        return req.output_ids

    assert run(True) == run(False)


def test_scan_forward_heterogeneous_matches_unrolled():
    """Eval-path forward_scan with a per-layer config list == unrolled
    forward, bit-for-bit (same quantizers per layer, same op order)."""
    import numpy as np
    from lqer_tpu.models import llama as llama_mod

    cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=3, heads=4,
                           kv_heads=2, inter=96)
    params = models.init_params(cfg, jax.random.PRNGKey(2))
    lin6 = {**Q_CONFIG["linear"], "x_quantizer": _q(6, [1, 16], True)}
    mm = Q_CONFIG["matmul"]
    q_het = dict(Q_CONFIG)
    q_het["model_layer_0"] = {
        "self_attn": {
            "q_proj": lin6, "k_proj": lin6, "v_proj": lin6, "o_proj": lin6,
            "matmul_0": mm, "matmul_1": mm,
        },
        "mlp": {p: lin6 for p in ("gate_proj", "up_proj", "down_proj")},
    }
    qcfgs = models.quantize_model(cfg, q_het, L_CONFIG)
    params = models.prepare_ptq(params, cfg, qcfgs)
    ids = jnp.asarray([[3, 17, 42, 9]], dtype=jnp.int32)
    ref = np.asarray(llama_mod.forward(params, ids, cfg, qcfgs))
    out = np.asarray(llama_mod.forward_scan(params, ids, cfg, qcfgs))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
