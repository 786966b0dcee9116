"""Pallas serving backend: fused-kernel model step vs software emulation.

Runs in interpret mode on CPU (real-TPU execution is covered by bench.py and
the verify recipe). Model dims are kernel-aligned (multiples of 256/128).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.serving import make_cache, model_step
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
L_CONFIG = {"linear": {"rank": 32}}


def test_pallas_step_matches_emulation():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=1, heads=4,
                           kv_heads=2, inter=256, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    from lqer_tpu.ops import block_fp_quantizer

    # A/B as the approximator produces them: 8-bit block_fp over [16,1]
    # blocks (`lqer_svd.py:46-47`) — values exactly representable in bf16,
    # which is what makes the kernel's bf16 operand path lossless.
    def ab_q(x):
        return block_fp_quantizer(x, width=8, exponent_width=8,
                                  block_size=[16, 1], skip_first_dim=False)

    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            out_dim, in_dim = params[prefix + ".weight"].shape
            params[prefix + ".A"] = ab_q(
                jax.random.normal(jax.random.PRNGKey(i + 10), (in_dim, 32)) * 0.01
            )
            params[prefix + ".B"] = ab_q(
                jax.random.normal(jax.random.PRNGKey(i + 20), (32, out_dim)) * 0.01
            )

    # serving prep packs from the ORIGINAL weights (bit-exact re-derivation
    # of W_q); the emulated reference path uses the PTQ'd params
    backend_unfused = prepare_serving_params(params, cfg, qcfgs,
                                             fuse_projections=False,
                                             fuse_mlp=False)
    assert len(backend_unfused["meta"]) == 7
    # default prep fuses q|k|v into one launch and the whole MLP into the
    # megakernel: 7 -> 3 launches per layer
    backend = prepare_serving_params(params, cfg, qcfgs)
    assert len(backend["meta"]) == 3
    p0 = "model.layers.0"
    assert backend["meta"][f"{p0}.self_attn.qkv_proj"]["splits"] == (
        256, 128, 128)
    assert backend["meta"][f"{p0}.mlp_fused"]["kind"] == "mlp"
    # with the megakernel off, gate|up still fuse pairwise
    backend_nomlp = prepare_serving_params(params, cfg, qcfgs, fuse_mlp=False)
    assert backend_nomlp["meta"][f"{p0}.mlp.gateup_proj"]["splits"] == (
        256, 256)
    params = models.prepare_ptq(params, cfg, qcfgs)

    ids = jnp.asarray([[3, 17, 42, 9]], dtype=jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)

    cache_a = make_cache(cfg, 1, 32, dtype=jnp.float32)
    ref_logits, _ = model_step(params, ids, cache_a, pos, cfg, qcfgs)

    cache_b = make_cache(cfg, 1, 32, dtype=jnp.float32)
    out_logits, _ = model_step(params, ids, cache_b, pos, cfg, qcfgs,
                               backend=backend, interpret=True)

    cache_c = make_cache(cfg, 1, 32, dtype=jnp.float32)
    unfused_logits, _ = model_step(params, ids, cache_c, pos, cfg, qcfgs,
                                   backend=backend_unfused, interpret=True)

    cache_d = make_cache(cfg, 1, 32, dtype=jnp.float32)
    nomlp_logits, _ = model_step(params, ids, cache_d, pos, cfg, qcfgs,
                                 backend=backend_nomlp, interpret=True)

    ref = np.asarray(ref_logits)
    out = np.asarray(out_logits)
    # bf16 operand rounding is exact for MXINT values; differences come from
    # f32 accumulation order inside the kernel vs the XLA dot
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
    # top-1 predictions must agree
    np.testing.assert_array_equal(
        np.argmax(out, axis=-1), np.argmax(ref, axis=-1)
    )
    # fused projections are per-column independent in the main GEMM and
    # block-diagonal in the correction: results match unfused very tightly
    # (only K-tile accumulation order can differ — here it doesn't)
    np.testing.assert_allclose(
        np.asarray(unfused_logits), out, atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(nomlp_logits), out,
                               atol=1e-5, rtol=1e-5)


def _variant_q_config(w=None, x=None, a_out=None, b_out=None):
    q = {
        "linear": {
            "name": "flexible_lqer", "is_ptq": True,
            "x_quantizer": x or _q(8, [1, 16], True),
            "w_quantizer": w or _q(4, [1, 16], False),
            "b_quantizer": _q(8, [1, 16], False),
        },
        "matmul": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
                   "w_quantizer": _q(8, [1, 16], True)},
    }
    if a_out is not None:
        q["linear"]["A_out_quantizer"] = a_out
    if b_out is not None:
        q["linear"]["B_out_quantizer"] = b_out
    return q


def test_format_guard_falls_back_to_emulation():
    """Non-canonical formats — the reference's W3 / integer-INT `[1,-1]` /
    minifloat / W-only-passthrough sweep variants
    (`sweep_lqer_act_int.sh:57-66`, `configs/template/opt-6.7b-int.toml`) —
    must NOT pack for the fused kernel; the backend-routed forward then runs
    the emulation fallback for every module and matches it bit-for-bit."""
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=1, heads=4,
                           kv_heads=2, inter=256, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(5))

    variants = {
        "w3": _variant_q_config(w=_q(3, [1, 16], False)),
        "int_whole_row": _variant_q_config(w=_q(4, [1, -1], False)),
        "minifloat_w": _variant_q_config(
            w={"name": "minifloat", "width": 4, "exponent_width": 2,
               "exponent_bias": None}),
        "w_only_passthrough": _variant_q_config(
            x={"name": "passthrough"},
            a_out={"name": "passthrough"}, b_out={"name": "passthrough"}),
        "odd_block_act": _variant_q_config(x=_q(8, [1, 32], True)),
    }
    ids = jnp.asarray([[3, 17, 42, 9]], dtype=jnp.int32)
    from lqer_tpu.models import llama as llama_mod

    for name, q in variants.items():
        qcfgs = models.quantize_model(cfg, q, L_CONFIG)
        backend = prepare_serving_params(params, cfg, qcfgs)
        if name == "odd_block_act":
            # [1,32]-block activations are still bf16-exact: the main GEMM
            # may pack (x_quantizer runs outside the kernel) but the MLP
            # megakernel (in-kernel act re-quant) must not
            assert not any(k.endswith("mlp_fused") for k in backend["meta"])
            continue
        assert backend["meta"] == {}, (name, list(backend["meta"]))
        pq = models.prepare_ptq(params, cfg, qcfgs)
        ref = np.asarray(llama_mod.forward(pq, ids, cfg, qcfgs))
        out = np.asarray(llama_mod.forward(pq, ids, cfg, qcfgs,
                                           backend=backend))
        np.testing.assert_array_equal(out, ref, err_msg=name)


def test_format_guard_threads_widths():
    """A non-default (but canonical-format) A_out width must pack and be
    threaded into the kernel meta instead of silently serving width 8."""
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=1, heads=4,
                           kv_heads=2, inter=256, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(6))
    q = _variant_q_config(a_out=_q(6, [1, 16], True))
    qcfgs = models.quantize_model(cfg, q, L_CONFIG)
    from lqer_tpu.ops import block_fp_quantizer

    def ab_q(x):
        return block_fp_quantizer(x, width=8, exponent_width=8,
                                  block_size=[16, 1], skip_first_dim=False)

    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            out_dim, in_dim = params[prefix + ".weight"].shape
            params[prefix + ".A"] = ab_q(
                jax.random.normal(jax.random.PRNGKey(i + 30), (in_dim, 32)) * 0.01)
            params[prefix + ".B"] = ab_q(
                jax.random.normal(jax.random.PRNGKey(i + 40), (32, out_dim)) * 0.01)
    backend = prepare_serving_params(params, cfg, qcfgs)
    assert backend["meta"], "canonical-format variant should pack"
    for key, m in backend["meta"].items():
        assert m["xa_width"] == 6, (key, m)
        assert m["out_width"] == 8, (key, m)


def test_engine_with_pallas_backend():
    """DecodeEngine routed through the fused kernel must emit the same
    tokens as the emulated engine (kernel-aligned dims, interpret on CPU)."""
    from lqer_tpu.serving import DecodeEngine, Request

    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=1, heads=4,
                           kv_heads=2, inter=256, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(3))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    backend = prepare_serving_params(params, cfg, qcfgs)
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(pb):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=1, max_len=64,
                           cache_dtype=jnp.float32, pallas_backend=pb)
        req = Request(prompt_ids=[3, 9, 27], max_new_tokens=3)
        eng.run([req])
        return req.output_ids

    emulated = run(None)
    fused = run(backend)
    assert fused == emulated, (fused, emulated)


@pytest.mark.slow
def test_engine_quantized_cache_attention_kernel():
    """MXINT8 KV cache + fused decode-attention kernel (in-VMEM cache
    decode): engine tokens must match the eager quantized-cache engine —
    round 1 made the quantized cache and the fused kernel mutually
    exclusive."""
    import os
    from unittest import mock

    from lqer_tpu.serving import DecodeEngine, Request

    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=1, heads=4,
                           kv_heads=2, inter=256, max_pos=256)
    params = models.init_params(cfg, jax.random.PRNGKey(13))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    backend = prepare_serving_params(params, cfg, qcfgs)
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(env, scan):
        with mock.patch.dict(os.environ, env):
            eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=128,
                               cache_dtype="mxint8", pallas_backend=backend,
                               scan_layers=scan)
            reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=4),
                    Request(prompt_ids=[5, 6], max_new_tokens=3)]
            eng.run(reqs)
        return [r.output_ids for r in reqs]

    eager = run({"LQER_DISABLE_ATTN_KERNEL": "1"}, False)
    kernel = run({}, False)
    assert kernel == eager, (kernel, eager)
    kernel_scan = run({}, True)
    assert kernel_scan == eager, (kernel_scan, eager)


@pytest.mark.slow
def test_engine_decode_attention_kernel_path():
    """max_len >= 128 engages the fused decode-attention kernel inside the
    engine; tokens must match the eager-attention engine exactly."""
    import os
    from unittest import mock

    from lqer_tpu.serving import DecodeEngine, Request

    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=1, heads=4,
                           kv_heads=2, inter=256, max_pos=256)
    params = models.init_params(cfg, jax.random.PRNGKey(11))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    backend = prepare_serving_params(params, cfg, qcfgs)
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(env):
        with mock.patch.dict(os.environ, env):
            eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=128,
                               cache_dtype=jnp.float32, pallas_backend=backend)
            reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=4),
                    Request(prompt_ids=[5, 6], max_new_tokens=3)]
            eng.run(reqs)
        return [r.output_ids for r in reqs]

    kernel = run({})
    eager = run({"LQER_DISABLE_ATTN_KERNEL": "1"})
    assert kernel == eager, (kernel, eager)


def test_opt_forward_with_backend_matches_emulated():
    """OPT eval forward routed through the Pallas kernels (fused qkv + MLP
    megakernel) vs the emulated forward: same top-1 logits."""
    from lqer_tpu.models import OPTConfig
    from lqer_tpu.models import opt as opt_mod

    cfg = OPTConfig.tiny(vocab_size=128, hidden=256, layers=2, heads=4,
                         ffn=256, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(21))
    q = dict(Q_CONFIG)
    q["bmm"] = q.pop("matmul")
    qcfgs = models.quantize_model(cfg, q, L_CONFIG)
    backend = prepare_serving_params(params, cfg, qcfgs)
    assert "model.decoder.layers.0.mlp_fused" in backend["meta"]
    params = models.prepare_ptq(params, cfg, qcfgs)

    ids = jnp.asarray([[3, 17, 42, 9]], dtype=jnp.int32)
    ref = np.asarray(opt_mod.forward(params, ids, cfg, qcfgs))
    out = np.asarray(opt_mod.forward(params, ids, cfg, qcfgs,
                                     backend=backend))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
    np.testing.assert_array_equal(np.argmax(out, -1), np.argmax(ref, -1))
