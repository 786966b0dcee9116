"""Tests for packed MXINT storage and the fused Pallas dequant-GEMM kernel.

Kernel runs in interpret mode on CPU (SURVEY.md §4e: kernel-vs-jnp-emulation
allclose tests); on real TPU hardware the same code compiles via Mosaic
(exercised by bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqer_tpu.ops import block_fp_quantizer
from lqer_tpu.ops.storage import (
    MXINT4,
    MXINT8,
    dequantize_mx,
    pack_int4_ksplit,
    quantize_mx,
    unpack_int4_ksplit,
)
from lqer_tpu.ops.pallas import (
    prepare_w4_weights,
    qlinear_w4_fused,
    qlinear_w4_fused_emulation,
)


class TestMXCodec:
    def test_roundtrip_matches_block_fp(self):
        # dequant(quantize_mx(w)) must equal the reference-parity
        # block_fp_quantizer with block_size=[1,16] on w^T (weights layout).
        w = jax.random.normal(jax.random.PRNGKey(0), (96, 64)) * 0.1  # (out,in)
        wt = w.T  # (K=in, N=out)
        codes, exps = quantize_mx(wt, MXINT4)
        deq = dequantize_mx(codes, exps, MXINT4, dtype=jnp.float32)
        ref = block_fp_quantizer(
            w, width=4, exponent_width=8, block_size=[1, 16],
            skip_first_dim=False,
        ).T
        np.testing.assert_allclose(np.asarray(deq), np.asarray(ref), atol=1e-6)

    def test_codes_range(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 32))
        codes, _ = quantize_mx(w, MXINT4)
        c = np.asarray(codes)
        assert c.min() >= -7 and c.max() <= 7  # sign-magnitude 4-bit

    def test_mxint8_exact_in_bf16(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (64, 32))
        codes, exps = quantize_mx(x, MXINT8)
        deq32 = dequantize_mx(codes, exps, MXINT8, dtype=jnp.float32)
        deq16 = dequantize_mx(codes, exps, MXINT8, dtype=jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(deq32), np.asarray(deq16.astype(jnp.float32))
        )

    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(3)
        codes = jnp.asarray(
            rng.integers(-8, 8, size=(512, 128), dtype=np.int64), jnp.int8
        )
        packed = pack_int4_ksplit(codes, tile_k=256)
        assert packed.shape == (256, 128)
        un = unpack_int4_ksplit(packed, tile_k=256)
        np.testing.assert_array_equal(np.asarray(un), np.asarray(codes))


def _mk_xq(key, m, k):
    """Activation path: MXINT8-quantized x, exact in bf16."""
    x = jax.random.normal(key, (m, k))
    return block_fp_quantizer(
        x, width=8, exponent_width=8, block_size=[1, 16], skip_first_dim=True
    )


class TestFusedKernel:
    @pytest.mark.parametrize("rank", [0, 32])
    @pytest.mark.parametrize("has_bias", [False, True])
    def test_kernel_matches_emulation(self, rank, has_bias):
        key = jax.random.PRNGKey(42)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        M, K, N = 16, 256, 256
        x_q = _mk_xq(k1, M, K)
        w = jax.random.normal(k2, (N, K)) * 0.05  # (out, in)
        a = (jax.random.normal(k3, (K, rank)) * 0.01) if rank else None
        b = (jax.random.normal(k4, (rank, N)) * 0.01) if rank else None
        bias = jax.random.normal(k5, (N,)) * 0.1 if has_bias else None

        prep = prepare_w4_weights(w, a, b, bias, tile_k=256, tile_n=128)
        out = qlinear_w4_fused(
            x_q, prep, tile_m=16, tile_n=128, interpret=True
        )
        ref = qlinear_w4_fused_emulation(x_q, w, a, b, bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-3
        )

    def test_kernel_multi_k_tiles(self):
        key = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(key)
        M, K, N = 8, 512, 128
        x_q = _mk_xq(k1, M, K)
        w = jax.random.normal(k2, (N, K)) * 0.05
        prep = prepare_w4_weights(w, tile_k=256)
        out = qlinear_w4_fused(x_q, prep, tile_m=8, tile_n=128, interpret=True)
        ref = qlinear_w4_fused_emulation(x_q, w, None, None, None)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-3
        )

    def test_layer_indexed_matches_per_layer(self):
        """Scalar-prefetch layer indexing over LAYER-STACKED prep arrays
        must reproduce the per-layer calls exactly — the lax.scan serving
        paths rely on this to avoid XLA materializing a copy of each
        layer's multi-MB weight slice (see _fused_call docstring)."""
        L, M, K, N, rank = 3, 8, 256, 256, 16
        key = jax.random.PRNGKey(11)
        x_q = _mk_xq(jax.random.fold_in(key, 99), M, K)
        preps = []
        for i in range(L):
            k2, k3, k4, k5 = jax.random.split(jax.random.fold_in(key, i), 4)
            w = jax.random.normal(k2, (N, K)) * 0.05
            a = jax.random.normal(k3, (K, rank)) * 0.01
            b = jax.random.normal(k4, (rank, N)) * 0.01
            bias = jax.random.normal(k5, (N,)) * 0.1
            preps.append(prepare_w4_weights(w, a, b, bias, tile_k=256,
                                            tile_n=128))
        stacked = {
            "tiles": jnp.stack([p["tiles"] for p in preps]),
            "a": jnp.stack([p["a"] for p in preps]),
            "b": jnp.stack([p["b"] for p in preps]),
            "bias": jnp.stack([p["bias"] for p in preps]),
            "tile_k": 256, "tile_n": 128, "fmt": preps[0]["fmt"],
        }
        for i in range(L):
            ref = qlinear_w4_fused(x_q, preps[i], tile_m=8, interpret=True)
            got = qlinear_w4_fused(
                x_q, stacked, tile_m=8, interpret=True,
                layer_index=jnp.asarray([i], jnp.int32),
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_small_m_padding(self):
        # decode shape: M=2 below the 8-sublane tile
        key = jax.random.PRNGKey(8)
        k1, k2 = jax.random.split(key)
        x_q = _mk_xq(k1, 2, 256)
        w = jax.random.normal(k2, (128, 256)) * 0.05
        prep = prepare_w4_weights(w, tile_k=256)
        out = qlinear_w4_fused(x_q, prep, interpret=True)
        assert out.shape == (2, 128)
        ref = qlinear_w4_fused_emulation(x_q, w, None, None, None)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-3
        )
