"""Fused quantized attention kernel vs the eager emulated attention.

Interpret mode on CPU; the oracle is exactly the eval path's math: quantized
QK^T (operands pre-quantized), f32 softmax, x_quantizer(P), P·V.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqer_tpu.ops import block_fp_quantizer
from lqer_tpu.ops.pallas.attention import quantized_attention


def _enc_t(x, g=16):
    """mx8_encode with the cache's transposed layout (token axis last for
    codes AND exps, kv_cache.init_quantized_kv_cache)."""
    from lqer_tpu.parallel.collectives import mx8_encode
    c, e = mx8_encode(x, g)
    return jnp.swapaxes(c, -1, -2), jnp.swapaxes(e, -1, -2)


def _aq(x):
    """activation quantizer: per (row, 16-group along last dim)."""
    return block_fp_quantizer(
        x, width=8, exponent_width=8, block_size=[1, 16], skip_first_dim=True
    )


def _kq_along_tokens(k):
    """K^T quantization (groups along tokens) as the eager path does it:
    quantize k^T (bh, d, L) with [1,16] blocks then transpose back."""
    kt = jnp.swapaxes(k, 1, 2)
    kt_q = _aq(kt)
    return jnp.swapaxes(kt_q, 1, 2)


def _eager_oracle(q_q, k_q, v_q, scale):
    s = jnp.einsum("bsd,bld->bsl", q_q, k_q).astype(jnp.float32) * scale
    L = s.shape[-1]
    q_idx = jnp.arange(s.shape[1])[:, None]
    kv_idx = jnp.arange(L)[None, :]
    mask = jnp.where(kv_idx <= q_idx, 0.0, -jnp.inf)
    s = s + mask[None]
    p = jax.nn.softmax(s, axis=-1)
    p_q = _aq(p)
    return jnp.einsum("bsl,bld->bsd", p_q, v_q)


@pytest.mark.parametrize("S,L,D", [(64, 64, 32), (96, 96, 64)])
def test_kernel_matches_eager(S, L, D):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    BH = 4
    q = jax.random.normal(k1, (BH, S, D))
    k = jax.random.normal(k2, (BH, L, D))
    v = jax.random.normal(k3, (BH, L, D))
    q_q, k_q, v_q = _aq(q), _kq_along_tokens(k), _aq(v)
    scale = 1.0 / np.sqrt(D)

    ref = np.asarray(_eager_oracle(q_q, k_q, v_q, scale))
    out = np.asarray(
        quantized_attention(q_q, k_q, v_q, scale=scale, tile_s=32,
                            group=16, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_kernel_fp_variant():
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (2, 32, 32))
    k = jax.random.normal(k2, (2, 32, 32))
    v = jax.random.normal(k3, (2, 32, 32))
    scale = 1.0 / np.sqrt(32)

    s = jnp.einsum("bsd,bld->bsl", q, k) * scale
    q_idx = jnp.arange(32)[:, None]
    kv_idx = jnp.arange(32)[None, :]
    s = s + jnp.where(kv_idx <= q_idx, 0.0, -jnp.inf)[None]
    ref = np.asarray(jnp.einsum("bsl,bld->bsd", jax.nn.softmax(s, -1), v))

    out = np.asarray(
        quantized_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v,
            scale=scale, tile_s=32, p_width=None, interpret=True,
        )
    )
    # bf16 rounding of raw (non-grid) q/k inputs dominates the tolerance
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_padded_seq_tile():
    # S not a multiple of tile_s -> padding path
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    q = _aq(jax.random.normal(k1, (2, 40, 32)))
    k = _kq_along_tokens(jax.random.normal(k2, (2, 48, 32)))
    v = _aq(jax.random.normal(k3, (2, 48, 32)))
    out = quantized_attention(q, k, v, scale=0.2, tile_s=32, interpret=True)
    assert out.shape == (2, 40, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


class TestDecodeAttention:
    """Fused decode attention vs the eager `_attend` oracle."""

    def _mk(self, b=2, h=4, kvh=2, L=64, d=32, seed=0):
        import numpy as np
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, kvh, L, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, kvh, L, d)), jnp.float32)
        pos = jnp.asarray([5, L - 1], jnp.int32)[:b]
        # zero out slots beyond each sequence's position (engine invariant)
        valid = jnp.arange(L)[None, None, :, None] <= pos[:, None, None, None]
        return q, k * valid, v * valid, pos

    def _eager(self, q, k, v, pos, window=None, scale_query=False,
               kv_pre_quantized=False):
        from lqer_tpu.serving.decode import _attend, _cache_mask
        from lqer_tpu.models.config_expand import resolve_model_configs

        qcfg = resolve_model_configs(1, {
            "linear": {"name": "flexible", "is_ptq": True},
            "matmul": {"name": "flexible",
                       "x_quantizer": _mx8(), "w_quantizer": _mx8()},
        }, None, "llama")[0]["attn"]
        b, h, _, d = q.shape
        L = k.shape[2]
        mask = _cache_mask(pos[:, None], L, jnp.float32, window=window)
        return _attend(q, k, v, mask, qcfg, d**-0.5,
                       h // k.shape[1], scale_query,
                       kv_pre_quantized=kv_pre_quantized), qcfg

    def test_matches_eager(self):
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention, decode_attention_widths,
            supports_decode_attention,
        )

        q, k, v, pos = self._mk()
        ref, qcfg = self._eager(q, k, v, pos)
        assert supports_decode_attention(qcfg)
        out = decode_attention(q, k, v, pos, scaling=q.shape[-1]**-0.5,
                               interpret=True,
                               **decode_attention_widths(qcfg))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_matches_eager_window(self):
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention, decode_attention_widths,
        )

        q, k, v, pos = self._mk(seed=3)
        ref, qcfg = self._eager(q, k, v, pos, window=16)
        out = decode_attention(q, k, v, pos, scaling=q.shape[-1]**-0.5,
                               window=16, interpret=True,
                               **decode_attention_widths(qcfg))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_matches_eager_scale_query(self):
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention, decode_attention_widths,
        )

        q, k, v, pos = self._mk(h=4, kvh=4, seed=5)
        ref, qcfg = self._eager(q, k, v, pos, scale_query=True)
        out = decode_attention(q, k, v, pos, scaling=q.shape[-1]**-0.5,
                               scale_query=True, interpret=True,
                               **decode_attention_widths(qcfg))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_layer_indexed_cache_matches_sliced(self):
        """Scalar-prefetch layer indexing over a layer-stacked quantized
        cache must equal per-layer sliced calls exactly (the scan decode
        path's no-copy cache read)."""
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention_quantized, decode_attention_widths_quantized,
        )

        NL = 3
        stacks = {k: [] for k in ("k_codes", "k_exps", "v_codes", "v_exps")}
        per_layer = []
        for i in range(NL):
            q, k, v, pos = self._mk(seed=20 + i)
            k_c, k_e = _enc_t(k)
            v_c, v_e = _enc_t(v)
            per_layer.append((q, k_c, k_e, v_c, v_e, pos))
            for key, arr in zip(stacks, (k_c, k_e, v_c, v_e)):
                stacks[key].append(arr)
        stacked = {k: jnp.stack(v) for k, v in stacks.items()}
        _, qcfg = self._eager(*self._mk(seed=20)[:3], self._mk(seed=20)[3])
        widths = decode_attention_widths_quantized(qcfg)
        for i, (q, k_c, k_e, v_c, v_e, pos) in enumerate(per_layer):
            ref = decode_attention_quantized(
                q, k_c, k_e, v_c, v_e, pos, scaling=q.shape[-1]**-0.5,
                interpret=True, **widths)
            got = decode_attention_quantized(
                q, stacked["k_codes"], stacked["k_exps"],
                stacked["v_codes"], stacked["v_exps"], pos,
                scaling=q.shape[-1]**-0.5, interpret=True,
                layer_index=jnp.asarray([i], jnp.int32), **widths)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_layer_indexed_fp_cache_matches_sliced(self):
        """The fp-cache kernel's scalar-prefetch layer indexing (round 4 —
        the bf16-cache scan path's no-copy cache read) must equal per-layer
        sliced calls exactly."""
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention, decode_attention_widths,
        )

        NL = 3
        per_layer = [self._mk(seed=40 + i) for i in range(NL)]
        k_st = jnp.stack([k for _, k, _, _ in per_layer]).astype(jnp.bfloat16)
        v_st = jnp.stack([v for _, _, v, _ in per_layer]).astype(jnp.bfloat16)
        _, qcfg = self._eager(*per_layer[0])
        widths = decode_attention_widths(qcfg)
        for i, (q, k, v, pos) in enumerate(per_layer):
            ref = decode_attention(
                q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), pos,
                scaling=q.shape[-1]**-0.5, interpret=True, **widths)
            got = decode_attention(
                q, k_st, v_st, pos, scaling=q.shape[-1]**-0.5,
                interpret=True, layer_index=jnp.asarray([i], jnp.int32),
                **widths)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_head_chunked_grid_matches(self, monkeypatch):
        """A VMEM budget too small for all KV heads must split the head dim
        across grid programs (kvh chunking) without changing results — the
        long-context (2048 x 32-head) configuration depends on this."""
        from lqer_tpu.ops.pallas import decode_attention as da

        q, k, v, pos = self._mk(b=2, h=8, kvh=4, L=64, d=32, seed=9)
        k_c, k_e = _enc_t(k)
        v_c, v_e = _enc_t(v)
        _, qcfg = self._eager(q, k, v, pos)
        widths = da.decode_attention_widths_quantized(qcfg)
        ref = da.decode_attention_quantized(
            q, k_c, k_e, v_c, v_e, pos, scaling=q.shape[-1]**-0.5,
            interpret=True, **widths)
        orig = da._kvh_chunk
        monkeypatch.setattr(
            da, "_kvh_chunk",
            lambda KVH, L, d, b, budget=0: orig(KVH, L, d, b,
                                                budget=int(2 * L * d * 4)))
        assert da._kvh_chunk(4, 64, 32, 1.0625) < 4  # split actually engages
        da.decode_attention_quantized.clear_cache()  # retrace with the split
        try:
            got = da.decode_attention_quantized(
                q, k_c, k_e, v_c, v_e, pos, scaling=q.shape[-1]**-0.5,
                interpret=True, **widths)
        finally:
            monkeypatch.undo()
            da.decode_attention_quantized.clear_cache()
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_quantized_cache_matches_eager_on_decoded(self):
        """The quantized-cache kernel (in-VMEM MXINT8 decode) must equal the
        eager path fed the DECODED cache under quantize-once-at-write
        semantics (K/V-side operand quantizers skipped — the cache format IS
        the operand format; `serving.decode._kv_skip_matmuls`)."""
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention_quantized, decode_attention_widths_quantized,
        )
        from lqer_tpu.parallel.collectives import mx8_decode, mx8_encode

        q, k, v, pos = self._mk(seed=7)
        k_c, k_e = mx8_encode(k, 16)
        v_c, v_e = mx8_encode(v, 16)
        k_dec = mx8_decode(k_c, k_e, 16, jnp.bfloat16)
        v_dec = mx8_decode(v_c, v_e, 16, jnp.bfloat16)
        ref, qcfg = self._eager(q, k_dec, v_dec, pos, kv_pre_quantized=True)
        out = decode_attention_quantized(
            q, jnp.swapaxes(k_c, -1, -2), jnp.swapaxes(k_e, -1, -2),
            jnp.swapaxes(v_c, -1, -2), jnp.swapaxes(v_e, -1, -2), pos,
            scaling=q.shape[-1]**-0.5,
            interpret=True, **decode_attention_widths_quantized(qcfg),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_quantized_cache_skips_kv_requant(self):
        """Quantize-once-at-write: feeding the kernel a cache whose values
        are NOT a fixed point of the old use-time token-group requantize must
        still match the skip-semantics oracle (i.e. the kernel really does
        no K-side requantization)."""
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention_quantized, decode_attention_widths_quantized,
        )
        from lqer_tpu.parallel.collectives import mx8_decode, mx8_encode

        # values with wildly varying magnitude along tokens: a token-group
        # requantize would change them (shared exponent over 16 tokens)
        q, k, v, pos = self._mk(seed=11)
        ramp = jnp.exp2(
            (jnp.arange(k.shape[2]) % 16).astype(jnp.float32) - 8.0
        )[None, None, :, None]
        k = k * ramp
        v = v * ramp
        k_c, k_e = mx8_encode(k, 16)
        v_c, v_e = mx8_encode(v, 16)
        k_dec = mx8_decode(k_c, k_e, 16, jnp.bfloat16)
        v_dec = mx8_decode(v_c, v_e, 16, jnp.bfloat16)
        ref, qcfg = self._eager(q, k_dec, v_dec, pos, kv_pre_quantized=True)
        out = decode_attention_quantized(
            q, jnp.swapaxes(k_c, -1, -2), jnp.swapaxes(k_e, -1, -2),
            jnp.swapaxes(v_c, -1, -2), jnp.swapaxes(v_e, -1, -2), pos,
            scaling=q.shape[-1]**-0.5,
            interpret=True, **decode_attention_widths_quantized(qcfg),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestStreamingDecodeAttention:
    """Two-pass chunked-L decode attention (L beyond VMEM residency)."""

    _mk = TestDecodeAttention._mk
    _eager = TestDecodeAttention._eager

    def test_matches_eager_and_one_pass(self):
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention_quantized,
            decode_attention_quantized_streaming,
            decode_attention_widths_quantized,
        )
        from lqer_tpu.parallel.collectives import mx8_decode, mx8_encode

        q, k, v, pos = self._mk(b=2, h=4, kvh=2, L=512, d=32, seed=13)
        k_c, k_e = mx8_encode(k, 16)
        v_c, v_e = mx8_encode(v, 16)
        args = (jnp.swapaxes(k_c, -1, -2), jnp.swapaxes(k_e, -1, -2),
                jnp.swapaxes(v_c, -1, -2), jnp.swapaxes(v_e, -1, -2))
        ref_e, qcfg = self._eager(
            q, mx8_decode(k_c, k_e, 16, jnp.bfloat16),
            mx8_decode(v_c, v_e, 16, jnp.bfloat16), pos,
            kv_pre_quantized=True)
        widths = decode_attention_widths_quantized(qcfg)
        one_pass = decode_attention_quantized(
            q, *args, pos, scaling=q.shape[-1]**-0.5, interpret=True,
            **widths)
        stream = decode_attention_quantized_streaming(
            q, *args, pos, scaling=q.shape[-1]**-0.5, l_chunk=128,
            interpret=True, **widths)
        # f32 accumulation order differs (online denominator, chunked o) —
        # the documented streaming contract is allclose, not bitwise
        np.testing.assert_allclose(np.asarray(stream), np.asarray(one_pass),
                                   atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(stream), np.asarray(ref_e),
                                   atol=2e-3, rtol=2e-3)

    def test_layer_indexed_matches_sliced(self):
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention_quantized_streaming,
            decode_attention_widths_quantized,
        )

        NL = 2
        per_layer = []
        stacks = {k: [] for k in ("kc", "ke", "vc", "ve")}
        for i in range(NL):
            q, k, v, pos = self._mk(b=2, h=4, kvh=2, L=256, d=32,
                                    seed=30 + i)
            k_c, k_e = _enc_t(k)
            v_c, v_e = _enc_t(v)
            per_layer.append((q, k_c, k_e, v_c, v_e, pos))
            for key, a in zip(stacks, (k_c, k_e, v_c, v_e)):
                stacks[key].append(a)
        stacked = {k: jnp.stack(v) for k, v in stacks.items()}
        _, qcfg = self._eager(*self._mk(seed=30)[:4])
        widths = decode_attention_widths_quantized(qcfg)
        for i, (q, k_c, k_e, v_c, v_e, pos) in enumerate(per_layer):
            ref = decode_attention_quantized_streaming(
                q, k_c, k_e, v_c, v_e, pos, scaling=q.shape[-1]**-0.5,
                l_chunk=64, interpret=True, **widths)
            got = decode_attention_quantized_streaming(
                q, stacked["kc"], stacked["ke"], stacked["vc"],
                stacked["ve"], pos, scaling=q.shape[-1]**-0.5, l_chunk=64,
                interpret=True, layer_index=jnp.asarray([i], jnp.int32),
                **widths)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_window_and_long_l(self):
        """Sliding window across chunk boundaries + an L=16K CPU-interpret
        run (the r3 VERDICT item-6 'parity test at L=16K')."""
        from lqer_tpu.ops.pallas.decode_attention import (
            decode_attention_quantized_streaming,
            decode_attention_widths_quantized,
        )
        from lqer_tpu.parallel.collectives import mx8_decode, mx8_encode

        q, k, v, pos = self._mk(b=1, h=2, kvh=2, L=16384, d=16, seed=21)
        k_c, k_e = mx8_encode(k, 16)
        v_c, v_e = mx8_encode(v, 16)
        args = (jnp.swapaxes(k_c, -1, -2), jnp.swapaxes(k_e, -1, -2),
                jnp.swapaxes(v_c, -1, -2), jnp.swapaxes(v_e, -1, -2))
        ref_e, qcfg = self._eager(
            q, mx8_decode(k_c, k_e, 16, jnp.bfloat16),
            mx8_decode(v_c, v_e, 16, jnp.bfloat16), pos,
            window=4096, kv_pre_quantized=True)
        widths = decode_attention_widths_quantized(qcfg)
        out = decode_attention_quantized_streaming(
            q, *args, pos, scaling=q.shape[-1]**-0.5, l_chunk=2048,
            window=4096, interpret=True, **widths)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_e),
                                   atol=2e-3, rtol=2e-3)


def _mx8():
    return {"name": "block_fp", "width": 8, "exponent_width": 8,
            "exponent_bias": None, "block_size": [1, 16],
            "skip_first_dim": True}
