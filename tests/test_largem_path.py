"""Large-M (prefill/eval) dense path vs the fused kernels: the
dequant-once-to-HBM weights must be BIT-identical to the kernel's in-VMEM
dequant, and the full linear/MLP outputs must agree up to f32 accumulation
order."""

import jax
import jax.numpy as jnp
import numpy as np

from lqer_tpu.ops.pallas.dequant_gemm import (
    prepare_w4_weights,
    qlinear_w4_dense_largeM,
    qlinear_w4_fused,
    unpack_tiles_to_bf16,
)
from lqer_tpu.ops.pallas.mlp_fused import (
    mlp_w4_dense_largeM,
    mlp_w4_fused,
    prepare_mlp_weights,
)
from lqer_tpu.ops.quantizers import block_fp_quantizer
from lqer_tpu.ops.storage import MXINT4, MXINT8, dequantize_mx, quantize_mx


def _aq(x):
    return block_fp_quantizer(x, width=8, exponent_width=8,
                              block_size=[1, 16], skip_first_dim=True)


def test_unpack_tiles_matches_dequantize_mx():
    for fmt in (MXINT4, MXINT8):
        w = jax.random.normal(jax.random.PRNGKey(0), (384, 256)) * 0.02
        wt = jnp.asarray(w, jnp.float32).T  # (K=256, N=384)
        prep = prepare_w4_weights(w, fmt=fmt, tile_k=128, tile_n=128)
        got = unpack_tiles_to_bf16(prep["tiles"], 128, 128, fmt)
        codes, exps = quantize_mx(wt, fmt)
        ref = dequantize_mx(codes, exps, fmt, jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32),
                                      err_msg=str(fmt))


def test_linear_largeM_matches_kernel():
    K, N, R, M = 256, 384, 32, 64
    w = jax.random.normal(jax.random.PRNGKey(1), (N, K)) * 0.02
    a = jax.random.normal(jax.random.PRNGKey(2), (K, R)) * 0.02
    b = jax.random.normal(jax.random.PRNGKey(3), (R, N)) * 0.02
    bias = jax.random.normal(jax.random.PRNGKey(4), (N,)) * 0.01
    x_q = _aq(jax.random.normal(jax.random.PRNGKey(5), (M, K)))
    prep = prepare_w4_weights(w, a=a, b=b, bias=bias, tile_k=128, tile_n=128)
    ref = qlinear_w4_fused(x_q, prep, interpret=True)
    got = qlinear_w4_dense_largeM(x_q, prep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_mlp_largeM_matches_kernel():
    K, I, N, R, M = 256, 384, 256, 32, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 9)
    wg = jax.random.normal(ks[0], (I, K)) * 0.02
    wu = jax.random.normal(ks[1], (I, K)) * 0.02
    wd = jax.random.normal(ks[2], (N, I)) * 0.02
    ag = jax.random.normal(ks[3], (K, R)) * 0.02
    bg = jax.random.normal(ks[4], (R, I)) * 0.02
    au = jax.random.normal(ks[5], (K, R)) * 0.02
    bu = jax.random.normal(ks[6], (R, I)) * 0.02
    ad = jax.random.normal(ks[7], (I, R)) * 0.02
    bd = jax.random.normal(ks[8], (R, N)) * 0.02
    x_q = _aq(jax.random.normal(jax.random.PRNGKey(8), (M, K)))
    prep = prepare_mlp_weights(
        wg, wu, wd, a_gate=ag, b_gate=bg, a_up=au, b_up=bu,
        a_down=ad, b_down=bd, tile_k=128, tile_k2=128,
        tile_i=128, tile_n=128)
    ref = mlp_w4_fused(x_q, prep, tile_i=128, tile_n=128, interpret=True)
    got = mlp_w4_dense_largeM(x_q, prep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=4e-4, atol=4e-4)


def test_mlp_largeM_layer_indexed_padded():
    """Layer-stacked prep + pad_i: the scan-path large-M call."""
    K, I, N, M, NL = 256, 320, 256, 48, 2
    preps = []
    for li in range(NL):
        ks = jax.random.split(jax.random.PRNGKey(li), 3)
        preps.append(prepare_mlp_weights(
            jax.random.normal(ks[0], (I, K)) * 0.02,
            jax.random.normal(ks[1], (I, K)) * 0.02,
            jax.random.normal(ks[2], (N, I)) * 0.02,
            tile_k=128, tile_k2=128, tile_i=128, tile_n=128,
            pad_i=384))
    stacked = {k: (None if preps[0][k] is None
                   else jnp.stack([p[k] for p in preps]))
               for k in preps[0] if not isinstance(preps[0][k], (bool, int))
               and k != "fmt"}
    static = {k: preps[0][k] for k in ("gated", "fmt", "tile_k", "tile_k2",
                                       "tile_i", "tile_n")}
    x_q = _aq(jax.random.normal(jax.random.PRNGKey(9), (M, K)))
    for li in range(NL):
        ref = mlp_w4_fused(x_q, preps[li], tile_i=128, tile_n=128,
                           interpret=True)
        got = mlp_w4_dense_largeM(
            x_q, {**stacked, **static},
            layer_index=jnp.asarray(li, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=4e-4, atol=4e-4, err_msg=f"li={li}")


def test_unpack_pallas_matches_jnp():
    from lqer_tpu.ops.pallas.dequant_gemm import _unpack_tiles_pallas
    import jax.numpy as jnp

    for fmt in (MXINT4, MXINT8):
        w = jax.random.normal(jax.random.PRNGKey(11), (384, 256)) * 0.02
        prep = prepare_w4_weights(w, fmt=fmt, tile_k=128, tile_n=128)
        ref = unpack_tiles_to_bf16(prep["tiles"], 128, 128, fmt,
                                   use_pallas=False)
        got = _unpack_tiles_pallas(prep["tiles"], 128, 128, fmt, None,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))
        # layer-indexed variant
        stacked = jnp.stack([prep["tiles"], prep["tiles"]])
        got2 = _unpack_tiles_pallas(stacked, 128, 128, fmt,
                                    jnp.asarray([1], jnp.int32),
                                    interpret=True)
        np.testing.assert_array_equal(np.asarray(got2, np.float32),
                                      np.asarray(ref, np.float32))


def test_in_kernel_x_quantize_bit_exact():
    """serving-path in-kernel activation quantization (round 5) must be
    BIT-identical to the XLA x_quantizer path: K tiles split at 16-group
    boundaries and zero-group fills affect no fake-quant value."""
    from lqer_tpu.ops.quantizers import block_fp_quantizer as bq

    K, N, R, M = 256, 384, 32, 24
    w = jax.random.normal(jax.random.PRNGKey(21), (N, K)) * 0.02
    a = jax.random.normal(jax.random.PRNGKey(22), (K, R)) * 0.02
    b = jax.random.normal(jax.random.PRNGKey(23), (R, N)) * 0.02
    prep = prepare_w4_weights(w, a=a, b=b, tile_k=128, tile_n=128)
    x = jax.random.normal(jax.random.PRNGKey(24), (M, K))
    # sprinkle exact-zero groups (the fill corner)
    x = x.at[:, 32:48].set(0.0)
    x_pre = _aq(x).astype(jnp.bfloat16)
    ref = qlinear_w4_fused(x_pre, prep, interpret=True)
    got = qlinear_w4_fused(x.astype(jnp.float32), prep, quant_x_width=8,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    from lqer_tpu.ops.pallas.mlp_fused import (
        mlp_w4_fused as _mlp,
        prepare_mlp_weights as _pmw,
    )

    I = 256
    wg = jax.random.normal(jax.random.PRNGKey(25), (I, K)) * 0.02
    wu = jax.random.normal(jax.random.PRNGKey(26), (I, K)) * 0.02
    wd = jax.random.normal(jax.random.PRNGKey(27), (N, I)) * 0.02
    mp = _pmw(wg, wu, wd, tile_k=128, tile_k2=128, tile_i=128, tile_n=128)
    ref_m = _mlp(x_pre, mp, tile_i=128, tile_n=128, interpret=True)
    got_m = _mlp(x.astype(jnp.float32), mp, tile_i=128, tile_n=128,
                 quant_x_width=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))
