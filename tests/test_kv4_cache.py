"""Opt-in MXINT4 KV cache (round 5): codec parity, kernel vs eager oracle,
staged W4 kernel, and engine integration with width-4 K/V configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.ops.quantizers import block_fp_quantizer
from lqer_tpu.ops.pallas.decode_attention import (
    decode_attention_quantized,
    decode_attention_quantized_staged,
)
from lqer_tpu.parallel.collectives import mx4_decode, mx4_encode
from lqer_tpu.serving import DecodeEngine, Request
from lqer_tpu.serving import decode as dec
from lqer_tpu.serving.kv_cache import cache_code_width


def test_mx4_codec_matches_block_fp_w4():
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 64))
    y = mx4_decode(*mx4_encode(x, 16, zero_fill=1.0), 16)
    ref = block_fp_quantizer(x, width=4, exponent_width=8,
                             block_size=[1, 16], skip_first_dim=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def _w4_cache(key, NL, B, KVH, L, D):
    vals = jax.random.normal(key, (NL, B, KVH, L, D))
    c, e = mx4_encode(vals, 16, zero_fill=1.0)
    # codes (…, L, D/2) → transposed token-axis-last (…, D/2, L)
    return jnp.swapaxes(c, -1, -2), jnp.swapaxes(e, -1, -2), vals


def test_w4_kernel_matches_eager_oracle():
    NL, B, KVH, L, D, NREP = 2, 2, 2, 256, 32, 2
    H = KVH * NREP
    kc, ke, kv_vals = _w4_cache(jax.random.PRNGKey(0), NL, B, KVH, L, D)
    vc, ve, v_vals = _w4_cache(jax.random.PRNGKey(1), NL, B, KVH, L, D)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, H, 1, D))
    positions = jnp.array([100, 37], jnp.int32)
    out = decode_attention_quantized(
        q, kc, ke, vc, ve, positions, scaling=0.25,
        layer_index=jnp.asarray([1], jnp.int32), interpret=True)

    # eager oracle on the mx4-decoded cache (quantize-once-at-write: no
    # K/V use-time quantizers; q/probs at the kernel's widths)
    k_dec = mx4_decode(jnp.swapaxes(kc, -1, -2)[1],
                       jnp.swapaxes(ke, -1, -2)[1], 16)  # (B,KVH,L,D)
    v_dec = mx4_decode(jnp.swapaxes(vc, -1, -2)[1],
                       jnp.swapaxes(ve, -1, -2)[1], 16)

    def aq(x):
        return block_fp_quantizer(x, width=8, exponent_width=8,
                                  block_size=[1, 16], skip_first_dim=True)

    qq = aq(q[:, :, 0, :].reshape(B * H, D)).reshape(B, H, D)
    k_full = jnp.repeat(k_dec, NREP, axis=1)
    v_full = jnp.repeat(v_dec, NREP, axis=1)
    s = jnp.einsum("bhd,bhld->bhl", qq, k_full) * 0.25
    mask = jnp.arange(L)[None, None, :] <= positions[:, None, None]
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    pq = block_fp_quantizer(p.reshape(B * H, L), width=8, exponent_width=8,
                            block_size=[1, 16],
                            skip_first_dim=True).reshape(B, H, L)
    ref = jnp.einsum("bhl,bhld->bhd", pq, v_full)
    np.testing.assert_allclose(np.asarray(out[:, :, 0, :]), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_w4_staged_kernel_matches_one_pass_on_materialized():
    NL, B, KVH, L, D, NREP, SW = 2, 2, 2, 256, 32, 2, 64
    H = KVH * NREP
    kc, ke, _ = _w4_cache(jax.random.PRNGKey(3), NL, B, KVH, L, D)
    vc, ve, _ = _w4_cache(jax.random.PRNGKey(4), NL, B, KVH, L, D)
    ksc, kse, _ = _w4_cache(jax.random.PRNGKey(5), NL, B, KVH, SW, D)
    vsc, vse, _ = _w4_cache(jax.random.PRNGKey(6), NL, B, KVH, SW, D)
    q = jax.random.normal(jax.random.PRNGKey(7), (B, H, 1, D))
    kh = jax.random.normal(jax.random.PRNGKey(8), (B, KVH, 1, D))
    vh = jax.random.normal(jax.random.PRNGKey(9), (B, KVH, 1, D))
    positions = jnp.array([70, 37], jnp.int32)
    flushed = (positions // 32) * 32
    attn, ksc2, kse2, vsc2, vse2 = decode_attention_quantized_staged(
        q, kc, ke, vc, ve, ksc, kse, vsc, vse, kh, vh,
        positions, flushed, jnp.asarray([0], jnp.int32),
        scaling=0.25, interpret=True)
    # staged write bytes == XLA mx4 encode of the fresh rows at lane pos%SW
    khc, khe = mx4_encode(kh, 16, zero_fill=1.0)
    for b in range(B):
        r = int(positions[b]) % SW
        np.testing.assert_array_equal(
            np.asarray(ksc2)[0, b, :, :, r],
            np.asarray(khc)[b, :, 0, :])
        np.testing.assert_array_equal(
            np.asarray(kse2)[0, b, :, :, r],
            np.asarray(khe)[b, :, 0, :])
    # attention equals the one-pass kernel on the materialized cache
    kc_m, ke_m = np.array(kc), np.array(ke)
    vc_m, ve_m = np.array(vc), np.array(ve)
    vhc, vhe = mx4_encode(vh, 16, zero_fill=1.0)
    for b in range(B):
        p, f = int(positions[b]), int(flushed[b])
        for t in range(f, p + 1):
            j = t % SW
            if t == p:
                kc_m[:, b, :, :, t] = np.asarray(khc)[b, :, 0, :]
                ke_m[:, b, :, :, t] = np.asarray(khe)[b, :, 0, :]
                vc_m[:, b, :, :, t] = np.asarray(vhc)[b, :, 0, :]
                ve_m[:, b, :, :, t] = np.asarray(vhe)[b, :, 0, :]
            else:
                kc_m[:, b, :, :, t] = np.asarray(ksc)[:, b, :, :, j][0] \
                    if NL == 1 else np.asarray(ksc)[0, b, :, :, j]
                ke_m[:, b, :, :, t] = np.asarray(kse)[0, b, :, :, j]
                vc_m[:, b, :, :, t] = np.asarray(vsc)[0, b, :, :, j]
                ve_m[:, b, :, :, t] = np.asarray(vse)[0, b, :, :, j]
    ref = decode_attention_quantized(
        q, jnp.asarray(kc_m), jnp.asarray(ke_m), jnp.asarray(vc_m),
        jnp.asarray(ve_m), positions, scaling=0.25,
        layer_index=jnp.asarray([0], jnp.int32), interpret=True)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def _q(width, block, skip):
    return {
        "name": "block_fp", "width": width, "exponent_width": 8,
        "exponent_bias": None, "block_size": block, "skip_first_dim": skip,
    }


def _kv4_qconfig():
    """W4A8 linears + KV4 attention: q/probs at width 8, K/V at width 4
    (matching the mxint4 cache's write grid)."""
    return {
        "linear": {
            "name": "flexible_lqer", "is_ptq": True,
            "x_quantizer": _q(8, [1, 16], True),
            "w_quantizer": _q(4, [1, 16], False),
            "b_quantizer": _q(8, [1, 16], False),
        },
        "matmul": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
                   "w_quantizer": _q(4, [1, 16], True)},
    }


def test_kv4_engine_tokens_scan_matches_unrolled():
    from lqer_tpu.serving.pallas_backend import prepare_serving_params

    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=2, heads=4,
                           kv_heads=2, inter=256, max_pos=128)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    qcfgs = models.quantize_model(cfg, _kv4_qconfig(),
                                  {"linear": {"rank": 16}})
    backend = prepare_serving_params(params, cfg, qcfgs)
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(cache_dtype, scan):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=128,
                           cache_dtype=cache_dtype, pallas_backend=backend,
                           scan_layers=scan)
        reqs = [Request(prompt_ids=[3, 9, 27, 4], max_new_tokens=6),
                Request(prompt_ids=[5, 6], max_new_tokens=4)]
        eng.run(reqs)
        return [r.output_ids for r in reqs]

    plain = run("mxint4", False)
    assert run("mxint4", True) == plain
    assert run("mxint4-staged", False) == plain
    assert run("mxint4-staged", True) == plain


def test_kv4_cache_width_detection_and_config_gate():
    cfg = LlamaConfig.tiny(vocab_size=64, hidden=128, layers=1, heads=4,
                           kv_heads=2, inter=64, max_pos=128)
    c4 = dec.make_cache(cfg, 2, 128, "mxint4")
    c8 = dec.make_cache(cfg, 2, 128, "mxint8")
    assert cache_code_width(c4) == 4 and cache_code_width(c8) == 8
    qcfgs = models.quantize_model(cfg, _kv4_qconfig(),
                                  {"linear": {"rank": 16}})
    attn_cfg = qcfgs[0]["attn"]
    assert dec._kv_config_is_cache_format(attn_cfg, 4)
    assert not dec._kv_config_is_cache_format(attn_cfg, 8)


def test_kv4_fused_admission_engages_and_matches_eager(monkeypatch):
    """KV4 + A8 q/probs rides the fused admission kernel (the K/V-side
    widths are exempt when pre-quantized on the cache grid)."""
    from lqer_tpu.models import common

    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=2, heads=4,
                           kv_heads=2, inter=256, max_pos=128)
    params = models.init_params(cfg, jax.random.PRNGKey(6))
    qcfgs = models.quantize_model(cfg, _kv4_qconfig(),
                                  {"linear": {"rank": 16}})
    params = models.prepare_ptq(params, cfg, qcfgs)
    ids = jax.random.randint(jax.random.PRNGKey(7), (2, 32), 0, 128)

    calls = []
    orig = common.fused_quantized_attention

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(common, "fused_quantized_attention", spy)

    def admit(fresh):
        cache = dec.make_cache(cfg, 2, 128, "mxint4-staged")
        pos = jnp.zeros((2,), jnp.int32)
        lg, c = dec.model_step(params, ids, cache, pos, cfg, qcfgs,
                               fresh_prefill=fresh)
        return np.asarray(lg, np.float32), jax.tree.map(np.asarray, c)

    lg_e, cache_e = admit(False)
    assert not calls
    lg_f, cache_f = admit(True)
    assert calls, "KV4 fused admission did not engage"
    for k in cache_e:
        np.testing.assert_array_equal(cache_e[k], cache_f[k], err_msg=k)
    np.testing.assert_allclose(lg_f, lg_e, atol=2e-2, rtol=2e-2)
