"""MLP megakernel (gate|up → act → act-quant → down in one pallas_call) vs
the emulated two-stage math. Interpret mode on CPU; the real-TPU run is part
of the verify recipe."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqer_tpu.ops.pallas.dequant_gemm import qlinear_w4_fused_emulation
from lqer_tpu.ops.pallas.mlp_fused import mlp_w4_fused, prepare_mlp_weights
from lqer_tpu.ops.quantizers import block_fp_quantizer


def _xq(key, m, k):
    x = jax.random.normal(key, (m, k))
    return block_fp_quantizer(
        x, width=8, exponent_width=8, block_size=[1, 16], skip_first_dim=True
    ).astype(jnp.bfloat16)


def _ab_q(x):
    return block_fp_quantizer(jnp.asarray(x, jnp.float32), width=8,
                              exponent_width=8, block_size=[16, 1],
                              skip_first_dim=False)


def _act_q(h):
    """The down projection's x_quantizer (MXINT8 groups of 16)."""
    return block_fp_quantizer(h, width=8, exponent_width=8,
                              block_size=[1, 16], skip_first_dim=True)


def _emulate(x_q, wg, wu, wd, abs_, biases, gated):
    a_g, b_g, a_u, b_u, a_d, b_d = abs_
    bias_g, bias_u, bias_d = biases
    y_g = qlinear_w4_fused_emulation(x_q, wg, a_g, b_g, bias_g)
    if gated:
        y_u = qlinear_w4_fused_emulation(x_q, wu, a_u, b_u, bias_u)
        h = jax.nn.silu(y_g) * y_u
    else:
        h = jnp.maximum(y_g, 0.0)
    h_q = _act_q(h).astype(jnp.bfloat16).astype(jnp.float32)
    return qlinear_w4_fused_emulation(h_q, wd, a_d, b_d, bias_d)


@pytest.mark.parametrize("gated,rank,bias", [
    # llama MLP with LQER correction — the heaviest interpret-mode compile
    pytest.param(True, 32, False, marks=pytest.mark.slow),
    (True, 0, False),    # llama MLP, no correction
    (False, 32, True),   # OPT fc1/relu/fc2 with biases + correction
])
def test_mlp_fused_matches_emulation(gated, rank, bias):
    rng = np.random.default_rng(0)
    M, K, I, N = 8, 256, 512, 256
    key = jax.random.PRNGKey(1)
    x_q = _xq(key, M, K)

    def w(o, i):
        return jnp.asarray(rng.standard_normal((o, i)) * 0.1, jnp.float32)

    wg, wu, wd = w(I, K), w(I, K) if gated else None, w(N, I)
    if rank > 0:
        a_g, b_g = _ab_q(rng.standard_normal((K, rank)) * 0.02), \
            _ab_q(rng.standard_normal((rank, I)) * 0.02)
        a_u, b_u = (_ab_q(rng.standard_normal((K, rank)) * 0.02),
                    _ab_q(rng.standard_normal((rank, I)) * 0.02)) \
            if gated else (None, None)
        a_d, b_d = _ab_q(rng.standard_normal((I, rank)) * 0.02), \
            _ab_q(rng.standard_normal((rank, N)) * 0.02)
    else:
        a_g = b_g = a_u = b_u = a_d = b_d = None
    if bias:
        bias_g = jnp.asarray(rng.standard_normal(I) * 0.1, jnp.float32)
        bias_u = jnp.asarray(rng.standard_normal(I) * 0.1, jnp.float32) \
            if gated else None
        bias_d = jnp.asarray(rng.standard_normal(N) * 0.1, jnp.float32)
    else:
        bias_g = bias_u = bias_d = None

    prep = prepare_mlp_weights(
        wg, wu, wd, a_gate=a_g, b_gate=b_g, a_up=a_u, b_up=b_u,
        a_down=a_d, b_down=b_d, bias_gate=bias_g, bias_up=bias_u,
        bias_down=bias_d, tile_i=128, tile_n=128,
    )
    out = mlp_w4_fused(x_q, prep, tile_i=128, tile_n=128, interpret=True)
    ref = _emulate(x_q, wg, wu, wd, (a_g, b_g, a_u, b_u, a_d, b_d),
                   (bias_g, bias_u, bias_d), gated)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_mlp_layer_indexed_matches_per_layer():
    """Scalar-prefetch layer indexing over layer-stacked MLP preps must
    reproduce the per-layer megakernel exactly (scan-body no-copy path)."""
    rng = np.random.default_rng(3)
    L, M, K, I, N, rank = 2, 8, 256, 512, 256, 16
    x_q = _xq(jax.random.PRNGKey(5), M, K)
    preps = []
    for _ in range(L):
        wg = jnp.asarray(rng.standard_normal((I, K)) * 0.1, jnp.float32)
        wu = jnp.asarray(rng.standard_normal((I, K)) * 0.1, jnp.float32)
        wd = jnp.asarray(rng.standard_normal((N, I)) * 0.1, jnp.float32)
        preps.append(prepare_mlp_weights(
            wg, wu, wd,
            a_gate=_ab_q(rng.standard_normal((K, rank)) * 0.02),
            b_gate=_ab_q(rng.standard_normal((rank, I)) * 0.02),
            a_up=_ab_q(rng.standard_normal((K, rank)) * 0.02),
            b_up=_ab_q(rng.standard_normal((rank, I)) * 0.02),
            a_down=_ab_q(rng.standard_normal((I, rank)) * 0.02),
            b_down=_ab_q(rng.standard_normal((rank, N)) * 0.02),
            tile_i=128, tile_n=128,
        ))
    static = {"gated", "fmt", "tile_k", "tile_k2", "tile_i", "tile_n"}
    stacked = {k: preps[0][k] for k in static}
    stacked.update({
        k: (None if preps[0][k] is None
            else jnp.stack([p[k] for p in preps]))
        for k in preps[0] if k not in static
    })
    for i in range(L):
        ref = mlp_w4_fused(x_q, preps[i], tile_i=128, tile_n=128,
                           interpret=True)
        got = mlp_w4_fused(x_q, stacked, tile_i=128, tile_n=128,
                           interpret=True,
                           layer_index=jnp.asarray([i], jnp.int32))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mlp_fused_multiple_m_tiles():
    """Prefill-sized batches: the (m, phase) grid must reproduce the
    single-tile math for every M tile."""
    rng = np.random.default_rng(1)
    M, K, I, N = 256, 256, 512, 256
    wg = jnp.asarray(rng.standard_normal((I, K)) * 0.1, jnp.float32)
    wu = jnp.asarray(rng.standard_normal((I, K)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((N, I)) * 0.1, jnp.float32)
    prep = prepare_mlp_weights(wg, wu, wd, tile_i=128, tile_n=128)
    x_q = _xq(jax.random.PRNGKey(9), M, K)
    big = mlp_w4_fused(x_q, prep, tile_m=128, tile_i=128, tile_n=128,
                       interpret=True)
    for m0 in range(0, M, 128):
        small = mlp_w4_fused(x_q[m0:m0 + 128], prep, tile_m=128,
                             tile_i=128, tile_n=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(big[m0:m0 + 128]),
                                      np.asarray(small))
