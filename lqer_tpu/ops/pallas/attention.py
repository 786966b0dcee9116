"""Fused quantized causal attention (Pallas).

Eager quantized attention (the reference's `matmul_0`/`matmul_1` path,
`llama_decoder.py:259-296`) materializes (b·h, S, L) score/probability
tensors in HBM. This kernel keeps one head's K/V resident in VMEM and fuses
QK^T → masked softmax → P-quantization → P·V per query tile, so HBM traffic
is Q+K+V+O only. Exact eager semantics are preserved:

* operands arrive pre-quantized to the activation format (MXINT8 values are
  exact in bf16);
* softmax is computed in f32 over the FULL row (no online rescaling — K fits
  in VMEM for the reference's 2048-context regime), identical to
  `jax.nn.softmax`;
* P is quantized per (row, group of 16 along the KV axis) with the same
  shared-exponent math as `block_fp` — matching the emulated
  ``x_quantizer(P) @ V``.

Layout trick: scores are computed TRANSPOSED, ``S^T = K·Q^T (L, TS)`` — the
softmax reduction and the 16-token P-quantization grouping then run along
sublanes, which Mosaic supports natively (lane-dim group reshapes do not
compile). V is stored pre-transposed ``(bh, D, L)`` so the output is one more
MXU dot ``V^T·P^T`` with no per-tile V relayout.

Scope: causal self-attention at L ≤ ~8K (VMEM-resident K/V per head). Longer
contexts need a streaming two-pass variant (out of the reference's scope —
SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quantize_sublane_groups(p: jnp.ndarray, mb: int, group: int) -> jnp.ndarray:
    """block_fp quantize-dequantize with shared exponents per (group of
    ``group`` along axis 0, column). p >= 0 (softmax output) so the sign
    path is trivial; exact zeros stay zero via the |x|<=1e-8 passthrough."""
    L, TS = p.shape
    v = p.reshape(L // group, group, TS)
    bmax = jnp.max(v, axis=1, keepdims=True)
    nz_min = jnp.min(jnp.where(bmax != 0, bmax, jnp.inf))
    fill = jnp.where(jnp.isinf(nz_min), jnp.float32(1.0), nz_min)
    bmax = jnp.where(bmax == 0, fill, bmax)
    e = jnp.clip(jnp.ceil(jnp.log2(bmax)), -127.0, 128.0)
    scale = jnp.exp2(e)
    shift = float(2**mb)
    mant = jnp.clip(jnp.round((v + 1e-9) / scale * shift), 0, 2**mb - 1)
    q = scale * (mant / shift)
    q = jnp.where(v <= 1e-8, v, q)
    return q.reshape(L, TS)


def _attn_kernel(q_ref, k_ref, vt_ref, o_ref, *, scale, tile_s, mb, group,
                 causal):
    # q: (1, TS, D), k: (1, L, D), vt: (1, D, L), o: (1, TS, D)
    ts_idx = pl.program_id(1)
    q = q_ref[0]          # (TS, D)
    k = k_ref[0]          # (L, D)
    vt = vt_ref[0]        # (D, L)
    L = k.shape[0]
    TS = q.shape[0]

    # transposed scores: (L, TS)
    s_t = jax.lax.dot_general(
        k, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    if causal:
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, (L, TS), 0)
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (L, TS), 1) + ts_idx * tile_s
        s_t = jnp.where(kv_idx <= q_idx, s_t, -jnp.inf)

    # exact f32 softmax along sublanes (the KV axis)
    m = jnp.max(s_t, axis=0, keepdims=True)
    p = jnp.exp(s_t - m)
    p = p / jnp.sum(p, axis=0, keepdims=True)

    # P quantization: 16-token shared-exponent groups along KV (sublanes)
    if mb is not None:
        p = _quantize_sublane_groups(p, mb, group)

    # out^T = V^T · P^T : (D, TS). Quantized P values (7-bit mantissas) are
    # exact in bf16; the unquantized (p_width=None) variant keeps f32.
    if mb is not None:
        o_t = jnp.dot(vt, p.astype(vt.dtype),
                      preferred_element_type=jnp.float32)
    else:
        o_t = jnp.dot(vt.astype(jnp.float32), p,
                      preferred_element_type=jnp.float32)
    o_ref[0] = o_t.T.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "tile_s", "p_width", "group", "causal",
                     "out_dtype", "interpret"),
)
def quantized_attention(
    q_q: jnp.ndarray,   # (BH, S, D) pre-quantized queries
    k_q: jnp.ndarray,   # (BH, L, D) pre-quantized keys
    v_q: jnp.ndarray,   # (BH, L, D) pre-quantized values
    *,
    scale: float,
    tile_s: int = 256,
    p_width: int | None = 8,
    group: int = 16,
    causal: bool = True,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused causal attention over pre-quantized operands.

    ``p_width``: activation-format width for the probability quantization
    (None disables — FP attention with fused softmax).
    ``interpret=None`` auto-selects interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # CPU interpret mode: XLA's DotThunk rejects BF16xBF16=F32 — keep f32
    # operands there (same guard as decode_attention's dot_dtype). Quantized
    # operands are exact in both dtypes.
    op_dtype = jnp.float32 if interpret else jnp.bfloat16
    BH, S, D = q_q.shape
    L = k_q.shape[1]
    assert L % group == 0, (L, group)
    pad_s = -S % tile_s
    if pad_s:
        q_q = jnp.pad(q_q, ((0, 0), (0, pad_s), (0, 0)))
    Sp = S + pad_s

    v_t = jnp.swapaxes(v_q, 1, 2)  # (BH, D, L)

    kernel = functools.partial(
        _attn_kernel, scale=scale, tile_s=tile_s,
        mb=None if p_width is None else p_width - 1, group=group,
        causal=causal,
    )
    out = pl.pallas_call(
        kernel,
        grid=(BH, Sp // tile_s),
        in_specs=[
            pl.BlockSpec((1, tile_s, D), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, L), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_s, D), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Sp, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BH * Sp * L * D * 2,
            bytes_accessed=2 * (BH * Sp * D + 2 * BH * L * D),
            transcendentals=BH * Sp * L,
        ),
        interpret=interpret,
    )(q_q.astype(op_dtype), k_q.astype(op_dtype),
      v_t.astype(jnp.float32) if interpret else v_t)
    return out[:, :S, :]
