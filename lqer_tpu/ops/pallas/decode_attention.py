"""Fused quantized DECODE attention (Pallas): one query token per slot
against the KV cache, with every operand quantization done in-kernel.

Why: the eager decode path (`serving.decode._attend`) runs the reference's
quantized matmuls (`llama_decoder.py:259-296` semantics) through XLA, which
materializes several full-cache-size intermediates per layer each step —
quantize(K^T) and quantize(V) alone touch ~10x the cache's own bytes.
Measured on a 7B engine this attention side costs ~1.5 ms/layer at L=512,
an order of magnitude over the cache-streaming bound. This kernel reads each
head's K/V once into VMEM and fuses:

    q_q = mx(q)                    # activation format, groups along d
    s   = q_q · mx_token(K)^T      # K^T quantized per 16-TOKEN group
    p   = softmax(mask(s * scale)) # exact f32 softmax over the full row
    p_q = mx(p)                    # groups along the KV axis
    o   = p_q · mx_d(V)            # V quantized per 16-wide d group

bit-exactly matching the eager path (same shared-exponent formulas incl.
sign/zero handling; bf16 operand dots with f32 accumulation — MXINT values
are exact in bf16). GQA indexes the shared KV head in the BlockSpec instead
of materializing `repeat_kv`.

Layout notes (Mosaic can reshape sublane groups, not lane groups): K arrives
(L, d) so 16-token groups lie along sublanes; V is transposed in-kernel to
(d, L) so its 16-wide d groups lie along sublanes too; scores/probs live
transposed as (L, 1) columns.

Scope: s=1 decode, L ≤ ~8K VMEM-resident per head. Both cache layouts are
covered: fp dtype (`decode_attention`) and MXINT8 codes+exponents decoded in
VMEM (`decode_attention_quantized` — the 8.5-bit HBM stream the quantized
cache exists for).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _quantize_sublane_groups


def _quantize_sublane_groups_signed(x, mb, group):
    """Signed block_fp quantize-dequantize, shared exponent per (group of
    ``group`` along axis 0, column) — same math as `block_fp_quantizer`
    (ceil-log2 exponent, round-half-even mantissa, |x|<=1e-8 passthrough)."""
    L, C = x.shape
    v = x.reshape(L // group, group, C)
    bmax = jnp.max(jnp.abs(v), axis=1, keepdims=True)
    nz_min = jnp.min(jnp.where(bmax != 0, bmax, jnp.inf))
    fill = jnp.where(jnp.isinf(nz_min), jnp.float32(1.0), nz_min)
    bmax = jnp.where(bmax == 0, fill, bmax)
    e = jnp.clip(jnp.ceil(jnp.log2(bmax)), -127.0, 128.0)
    scale = jnp.exp2(e)
    shift = float(2**mb)
    sign = jnp.sign(v + 1e-9)
    mant = jnp.clip(jnp.round((jnp.abs(v) + 1e-9) / scale * shift),
                    0, 2**mb - 1)
    q = sign * scale * (mant / shift)
    q = jnp.where(jnp.abs(v) <= 1e-8, v, q)
    return q.reshape(L, C)


def _kernel(*refs, scaling, scale_query, window, group, q_mb, k_mb, p_mb,
            v_mb, n_rep, drop_scalar=False):
    """One grid program = one SLOT: every head of the slot is processed in
    a static Python loop over KV heads (n_rep query heads each), so the
    per-program pipeline overhead amortizes over the whole slot and each KV
    head streams from HBM exactly once."""
    if drop_scalar:  # scalar-prefetch layer index consumed by the BlockSpecs
        refs = refs[1:]
    pos_ref, q_ref, k_ref, v_ref, o_ref = refs
    pos = pos_ref[pl.program_id(0)]
    qs = q_ref[0, :, 0, :].astype(jnp.float32)      # (H, d)
    H, d = qs.shape
    L = k_ref.shape[2]
    kvh = k_ref.shape[1]

    if scale_query:
        qs = qs * scaling
    # activation-quantize q: groups of 16 along d -> transpose to sublanes
    if q_mb is not None:
        qs = _quantize_sublane_groups_signed(qs.T, q_mb, group).T

    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    ok = kv_idx <= pos
    if window is not None:
        ok = jnp.logical_and(ok, kv_idx > pos - window)

    # ---- phase 1: all heads' scores, (L, n_rep) columns -----------------
    # softmax / probs-quantize run ONCE on the whole (L, H_blk) chunk — per
    # head they ran on (L, 1) planes at 1/128 lane utilization (round-3
    # kernel's dominant VPU cost beyond the stream itself).
    cols = []
    for kv in range(kvh):
        k = k_ref[0, kv].astype(jnp.float32)        # (L, d)
        q_kv = qs[kv * n_rep:(kv + 1) * n_rep]      # (n_rep, d)
        # K^T quantization: 16-TOKEN groups (sublanes of (L, d))
        if k_mb is not None:
            k = _quantize_sublane_groups_signed(k, k_mb, group)

        # transposed scores: (L, n_rep) = K · q^T. f32 operands: quantized
        # grids make the products exact; Mosaic rejects mixed bf16->f32
        # broadcasts at these widths, and the dot is tiny vs the stream.
        cols.append(jax.lax.dot_general(
            k, q_kv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    s_t = cols[0] if kvh == 1 else jnp.concatenate(cols, axis=1)  # (L, H_blk)
    if not scale_query:
        s_t = s_t * scaling
    s_t = jnp.where(ok, s_t, -jnp.inf)
    m = jnp.max(s_t, axis=0, keepdims=True)
    p = jnp.exp(s_t - m)
    p = p / jnp.sum(p, axis=0, keepdims=True)       # (L, H_blk) f32
    if p_mb is not None:
        p = _quantize_sublane_groups(p, p_mb, group)

    # ---- phase 2: P·V per head -----------------------------------------
    outs = []
    for kv in range(kvh):
        # V quantization: 16-wide d groups -> transpose to sublanes
        vt = v_ref[0, kv].astype(jnp.float32).T      # (d, L)
        if v_mb is not None:
            vt = _quantize_sublane_groups_signed(vt, v_mb, group)
        o_t = jnp.dot(vt, p[:, kv * n_rep:(kv + 1) * n_rep],
                      preferred_element_type=jnp.float32)  # (d, n_rep)
        outs.append(o_t.T)                           # (n_rep, d)

    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    o_ref[0, :, 0, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scaling", "scale_query", "window", "group",
                     "q_width", "k_width", "p_width", "v_width",
                     "out_dtype", "interpret"),
)
def decode_attention(
    q: jnp.ndarray,          # (B, H, 1, d) RAW queries (rope applied)
    k_cache: jnp.ndarray,    # (B, KVH, L, d) — or (NL, B, KVH, L, d)
    v_cache: jnp.ndarray,    #                   with layer_index
    positions: jnp.ndarray,  # (B,) int32 absolute position of the query
    *,
    scaling: float,
    scale_query: bool = False,
    window: int | None = None,
    group: int = 16,
    q_width: int | None = 8,
    k_width: int | None = 8,
    p_width: int | None = 8,
    v_width: int | None = 8,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
    layer_index=None,
) -> jnp.ndarray:
    """Fused decode attention over an fp (bf16/f32) cache; returns
    (B, H, 1, d). ``layer_index``: scalar int32 selecting the layer when the
    cache arrays carry a leading layer dim — same no-copy scalar-prefetch
    read as `decode_attention_quantized` (scan bodies must use it; a sliced
    cache operand makes XLA materialize the whole layer slice)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, S, d = q.shape
    assert S == 1, S
    indexed = layer_index is not None
    assert k_cache.ndim == (5 if indexed else 4), (
        "layer_index requires layer-stacked cache operands", k_cache.shape)
    KVH, L = k_cache.shape[-3], k_cache.shape[-2]
    n_rep = H // KVH
    assert L % group == 0, (L, group)
    kc = _kvh_chunk(KVH, L, d, k_cache.dtype.itemsize)
    G, Hq = KVH // kc, kc * n_rep

    kernel = functools.partial(
        _kernel, scaling=scaling, scale_query=scale_query, window=window,
        group=group, n_rep=n_rep,
        q_mb=None if q_width is None else q_width - 1,
        k_mb=None if k_width is None else k_width - 1,
        p_mb=None if p_width is None else p_width - 1,
        v_mb=None if v_width is None else v_width - 1,
        drop_scalar=indexed,
    )

    def im(f):
        return (lambda b, g, idx: f(b, g)) if indexed else f

    def im_w(f):
        return (lambda b, g, idx: (idx[0], *f(b, g))) if indexed else f

    def wshape(shape):
        return (None, *shape) if indexed else shape

    spec_kv = pl.BlockSpec(wshape((1, kc, L, d)),
                           im_w(lambda b, g: (b, g, 0, 0)),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((B,), im(lambda b, g: (0,)), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Hq, 1, d), im(lambda b, g: (b, g, 0, 0)),
                     memory_space=pltpu.VMEM),
        spec_kv, spec_kv,
    ]
    out_spec = pl.BlockSpec((1, Hq, 1, d), im(lambda b, g: (b, g, 0, 0)),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, H, 1, d), out_dtype)
    cost = pl.CostEstimate(
        flops=4 * B * H * L * d,
        bytes_accessed=2 * B * KVH * L * d * k_cache.dtype.itemsize,
        transcendentals=B * H * L,
    )
    args = (positions.astype(jnp.int32), q, k_cache, v_cache)
    if indexed:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, G),
            in_specs=in_specs,
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(jnp.asarray(layer_index, jnp.int32).reshape(1), *args)
    return pl.pallas_call(
        kernel,
        grid=(B, G),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(*args)


def _kvh_chunk_fits(L: int, d: int, group: int = 16) -> bool:
    """True when ONE KV head's whole-L quantized K+V block (double-buffered)
    fits the `_kvh_chunk` VMEM budget — beyond this the serving path
    switches to `decode_attention_quantized_streaming` (chunked L)."""
    per_head = 2 * L * d * (1 + 1 / group) * 2
    return per_head <= 12 * 1024 * 1024


def _kvh_chunk(KVH: int, L: int, d: int, bytes_per_val: float,
               budget: int = 12 * 1024 * 1024,
               extra_per_head: int = 0) -> int:
    """Largest divisor of KVH whose double-buffered K+V head-chunk block
    fits the VMEM budget — each grid program keeps ``chunk`` heads' whole-L
    K and V resident, so long contexts (e.g. 32 kv-heads x 2048 x 128) must
    split the head dim across programs instead of overflowing VMEM.

    Budget 12 MB of the ~16 MB VMEM: at 7B decode shapes (32 heads x 2048
    x 128) this selects an 8-head chunk — measured 0.453 vs 0.552 ms/layer
    for the 4-head chunk (fewer programs, larger DMA bursts; pure-fetch
    floor 0.337), round-4 bench_attention_probe."""
    per_head = 2 * L * d * bytes_per_val * 2  # K+V, double-buffered
    per_head += extra_per_head
    chunk = KVH
    while chunk > 1 and chunk * per_head > budget:
        c = chunk - 1
        while KVH % c:
            c -= 1
        chunk = c
    return chunk


def _decode_cache_block(c, e, d, group, width_n, cache_mb, dot_dtype):
    """codes (rows, N) + exps (d/g, N) → decoded (d, N). rows == d selects
    the direct int8 MXINT8 layout; rows == d/2 the nibble-packed MXINT4
    layout (d-split: low nibbles = rows [0, d/2), high = [d/2, d) — unpack
    is two shifts + a sublane concat, `collectives.mx4_encode`)."""
    if c.shape[0] == d:
        cf = c.astype(jnp.float32)
    else:
        ci = c.astype(jnp.int32)
        low = (ci << 28) >> 28
        high = (ci << 24) >> 28
        cf = jnp.concatenate([low, high], axis=0).astype(jnp.float32)
    scale = jnp.exp2(e.astype(jnp.float32) - cache_mb)
    return (cf.reshape(d // group, group, width_n) * scale[:, None, :]
            ).reshape(d, width_n).astype(dot_dtype)


def _kernel_quantized(*refs, scaling, scale_query, window, group, q_mb,
                      p_mb, n_rep, cache_mb, dot_dtype, drop_scalar=False):
    if drop_scalar:  # scalar-prefetch layer index consumed by the BlockSpecs
        refs = refs[1:]
    pos_ref, q_ref, kc_ref, ke_ref, vc_ref, ve_ref, o_ref = refs
    return _kernel_quantized_body(
        pos_ref, q_ref, kc_ref, ke_ref, vc_ref, ve_ref, o_ref,
        scaling=scaling, scale_query=scale_query, window=window, group=group,
        q_mb=q_mb, p_mb=p_mb, n_rep=n_rep, cache_mb=cache_mb,
        dot_dtype=dot_dtype,
    )


def _kernel_quantized_body(pos_ref, q_ref, kc_ref, ke_ref, vc_ref, ve_ref,
                           o_ref, *, scaling, scale_query, window, group,
                           q_mb, p_mb, n_rep, cache_mb, dot_dtype):
    """Quantized-cache variant: K/V arrive as MXINT8 codes stored TRANSPOSED
    (d, L) + per-16-wide d-group exponents (d/g, L)
    (`serving.kv_cache.init_quantized_kv_cache`) and decode IN VMEM — the
    HBM stream is 8.5 bits/value instead of 16/32.

    Quantize-once-at-write semantics (round 4): the cache's MXINT8 format IS
    the QK^T / P·V operand format — the stored values enter the dots
    directly, with no use-time K/V re-quantization (the eager quantized-cache
    path skips its k/v-side operand quantizers identically; see
    `serving.decode._attend`). Only q and the softmax probs are quantized
    in-kernel (activation format, groups along the contraction axis).
    Round-3's kernel reproduced the double quantization (cache format, then
    use-time token-group requantize) and burned ~5 full-cache VPU passes +
    two full-cache transposes per head on it — ~80 ms of the 98 ms decode
    step (BENCH_r03, VERDICT round 3). The transposed layout makes the
    decode a single sublane-broadcast multiply; everything else is
    small-plane work.
    """
    pos = pos_ref[pl.program_id(0)]
    qs = q_ref[0, :, 0, :].astype(jnp.float32)      # (H_blk, d)
    H, d = qs.shape
    L = kc_ref.shape[3]
    kvh = kc_ref.shape[1]

    if scale_query:
        qs = qs * scaling
    if q_mb is not None:
        qs = _quantize_sublane_groups_signed(qs.T, q_mb, group).T

    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    ok = kv_idx <= pos
    if window is not None:
        ok = jnp.logical_and(ok, kv_idx > pos - window)

    def decode_t(c_ref, e_ref, kv):
        """codes (d[,/2], L) + exps (d/g, L) → decoded (d, L): the d-groups
        lie on sublanes in the stored layout, so the whole decode is one
        sublane-split reshape + broadcast multiply (no transposes; the
        MXINT4 layout adds two nibble shifts + a sublane concat). f32
        multiply then bf16 cast matches `collectives.mx8_decode`/
        `mx4_decode` bit-for-bit."""
        return _decode_cache_block(c_ref[0, kv], e_ref[0, kv], d, group, L,
                                   cache_mb, dot_dtype)

    # ---- phase 1: all heads' scores ----------------------------------
    # Per-head MXU matvecs, but softmax/probs-quantize batched over the
    # whole chunk: per-head those ops ran on (L, n_rep≈1) planes at 1/128
    # lane utilization and cost more than the cache decode itself
    # (0.53 of 0.98 ms/layer, bench_attention_probe round 4).
    rows = []
    for kv in range(kvh):
        ktd = decode_t(kc_ref, ke_ref, kv)           # (d, L)
        q_kv = qs[kv * n_rep:(kv + 1) * n_rep]       # (n_rep, d) f32
        # scores (n_rep, L): bf16 operands on TPU (both 8-bit-mantissa grids,
        # exact in bf16 — identical products), f32 accumulation on the MXU.
        # dot_dtype is f32 under the CPU interpreter (DotThunk lacks small
        # bf16 dots).
        rows.append(jax.lax.dot_general(
            q_kv.astype(dot_dtype), ktd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    s = rows[0] if kvh == 1 else jnp.concatenate(rows, axis=0)  # (H_blk, L)
    if not scale_query:
        s = s * scaling
    s = jnp.where(ok, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)        # (H_blk, L) f32
    # probs quantize per 16-token group — groups must lie on sublanes
    # (Mosaic can't reshape lane groups), so the small (H_blk, L) plane
    # transposes; the full-cache operands never do.
    p_t = p.T                                        # (L, H_blk)
    if p_mb is not None:
        p_t = _quantize_sublane_groups(p_t, p_mb, group)
    p_t = p_t.astype(dot_dtype)

    # ---- phase 2: P·V per head ----------------------------------------
    outs = []
    for kv in range(kvh):
        vtd = decode_t(vc_ref, ve_ref, kv)           # (d, L)
        o_t = jnp.dot(vtd, p_t[:, kv * n_rep:(kv + 1) * n_rep],
                      preferred_element_type=jnp.float32)   # (d, n_rep)
        outs.append(o_t.T)

    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    o_ref[0, :, 0, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scaling", "scale_query", "window", "group",
                     "q_width", "p_width", "out_dtype", "interpret"),
)
def decode_attention_quantized(
    q: jnp.ndarray,          # (B, H, 1, d) RAW queries (rope applied)
    k_codes: jnp.ndarray,    # (B, KVH, d, L) int8 — or (NL, B, KVH, d, L)
    k_exps: jnp.ndarray,     # (B, KVH, d/16, L) int8    with layer_index
    v_codes: jnp.ndarray,
    v_exps: jnp.ndarray,
    positions: jnp.ndarray,  # (B,) int32
    *,
    scaling: float,
    scale_query: bool = False,
    window: int | None = None,
    group: int = 16,
    q_width: int | None = 8,
    p_width: int | None = 8,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
    layer_index=None,
) -> jnp.ndarray:
    """Fused decode attention over the MXINT8-quantized KV cache (codes
    stored transposed — token axis LAST — see
    `kv_cache.init_quantized_kv_cache`). Quantize-once-at-write: the stored
    MXINT8 values ARE the QK^T/P·V operands (no k/v use-time widths — the
    cache format fixes them at 8).

    ``layer_index``: scalar int32 selecting the layer when the cache arrays
    carry a leading layer dim — the kernel then reads the FULL stacked cache
    in place via a scalar-prefetch BlockSpec. Scan bodies must use this:
    threading a per-layer cache slice through scan xs makes XLA materialize
    a copy of the whole multi-hundred-MB slice every layer (the same
    pallas-operand/dynamic-slice pathology as dequant_gemm._fused_call —
    and at decode the cache stream dominates the step's bytes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, S, d = q.shape
    assert S == 1, S
    indexed = layer_index is not None
    assert k_codes.ndim == (5 if indexed else 4), (
        "layer_index requires layer-stacked cache operands", k_codes.shape)
    KVH, L = k_codes.shape[-3], k_codes.shape[-1]
    assert k_codes.shape[-2] in (d, d // 2), (
        "codes must be (…, d[,/2], L)", k_codes.shape)
    w4 = k_codes.shape[-2] == d // 2     # nibble-packed MXINT4 cache
    n_rep = H // KVH
    # exps: (..., d/group, L) — same minor axis as the transposed codes
    cache_group = d // k_exps.shape[-2]
    assert cache_group == group, (cache_group, group)
    assert k_exps.shape[-1] == L, (k_exps.shape, L)
    assert L % group == 0 and d % group == 0, (L, d, group)

    kernel = functools.partial(
        _kernel_quantized, scaling=scaling, scale_query=scale_query,
        window=window, group=group, n_rep=n_rep,
        cache_mb=3.0 if w4 else 7.0,
        q_mb=None if q_width is None else q_width - 1,
        p_mb=None if p_width is None else p_width - 1,
        dot_dtype=jnp.float32 if interpret else jnp.bfloat16,
        drop_scalar=indexed,
    )
    kc = _kvh_chunk(KVH, L, d, (0.5 if w4 else 1) + 1 / group)
    G, Hq = KVH // kc, kc * n_rep

    def im(f):
        return (lambda b, g, idx: f(b, g)) if indexed else f

    def im_w(f):
        return (lambda b, g, idx: (idx[0], *f(b, g))) if indexed else f

    def wshape(shape):
        return (None, *shape) if indexed else shape

    cr = k_codes.shape[-2]
    spec_c = pl.BlockSpec(wshape((1, kc, cr, L)),
                          im_w(lambda b, g: (b, g, 0, 0)),
                          memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec(wshape((1, kc, d // group, L)),
                          im_w(lambda b, g: (b, g, 0, 0)),
                          memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((B,), im(lambda b, g: (0,)), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Hq, 1, d), im(lambda b, g: (b, g, 0, 0)),
                     memory_space=pltpu.VMEM),
        spec_c, spec_e, spec_c, spec_e,
    ]
    out_spec = pl.BlockSpec((1, Hq, 1, d), im(lambda b, g: (b, g, 0, 0)),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, H, 1, d), out_dtype)
    cost = pl.CostEstimate(
        flops=4 * B * H * L * d,
        bytes_accessed=2 * B * KVH * L * (d + d // group),
        transcendentals=B * H * L,
    )
    args = (positions.astype(jnp.int32), q, k_codes, k_exps, v_codes, v_exps)
    if indexed:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, G),
            in_specs=in_specs,
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(jnp.asarray(layer_index, jnp.int32).reshape(1), *args)
    return pl.pallas_call(
        kernel,
        grid=(B, G),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(*args)


def supports_decode_attention(attn_cfg, cache_width: int = 8) -> bool:
    """Kernel-eligibility: both attention matmuls use the canonical MXINT
    activation format ([1,16] groups, block_fp, width <= 9 so values are
    exact in bf16) on both operands. The K/V-side widths must equal the
    CACHE's code width (8 for mxint8, 4 for the round-5 mxint4 cache):
    under quantize-once-at-write semantics the cache format stands in for
    the use-time operand quantizer, so a config asking for a different K/V
    width cannot ride the quantized-cache kernel."""

    def mx(c, width_ok=lambda w: w <= 9):
        return bool(
            c and c.get("name") == "block_fp"
            and list(c.get("block_size", ())) == [1, 16]
            and c.get("skip_first_dim", False)
            and c.get("exponent_width") == 8
            and c.get("exponent_bias") is None
            and width_ok(c.get("width", 99))
        )

    qk, pv = attn_cfg.qk_cfg, attn_cfg.pv_cfg
    if qk is None or pv is None:
        return False
    qx = qk.get("x_quantizer") or qk.get("default")
    kx = qk.get("w_quantizer") or qk.get("default")
    px = pv.get("x_quantizer") or pv.get("default")
    vx = pv.get("w_quantizer") or pv.get("default")
    return (mx(qx) and mx(px)
            and mx(kx, lambda w: w == cache_width)
            and mx(vx, lambda w: w == cache_width))


def decode_attention_widths(attn_cfg) -> dict:
    """Widths for the fp-cache kernel (all four operand quantizers run
    in-kernel). Fp (unquantized) attention configs map to all-None widths —
    the kernel then runs pure bf16/f32 flash-style decode attention (the
    ``LQER_FP_ATTN_KERNEL`` serving mode)."""
    qk, pv = attn_cfg.qk_cfg, attn_cfg.pv_cfg
    if qk is None and pv is None:
        return {"q_width": None, "k_width": None,
                "p_width": None, "v_width": None}
    return {
        "q_width": (qk.get("x_quantizer") or qk.get("default"))["width"],
        "k_width": (qk.get("w_quantizer") or qk.get("default"))["width"],
        "p_width": (pv.get("x_quantizer") or pv.get("default"))["width"],
        "v_width": (pv.get("w_quantizer") or pv.get("default"))["width"],
    }


def decode_attention_widths_quantized(attn_cfg) -> dict:
    """Widths for the quantized-cache kernel: only q and probs quantize at
    use time (K/V widths are fixed by the cache's MXINT8 format)."""
    w = decode_attention_widths(attn_cfg)
    return {"q_width": w["q_width"], "p_width": w["p_width"]}


# ---------------------------------------------------------------------------
# Ring-staged decode attention: staging write + combined attend, one launch
# ---------------------------------------------------------------------------
def _kernel_quantized_staged(idx_ref, pos_ref, fl_ref, q_ref, kc_ref, ke_ref,
                             vc_ref, ve_ref, ksc_ref, kse_ref, vsc_ref,
                             vse_ref, kh_ref, vh_ref,
                             o_ref, ksc_o, kse_o, vsc_o, vse_o,
                             *, scaling, scale_query, group, q_mb, p_mb,
                             n_rep, cache_mb, dot_dtype):
    """Staged-cache decode step (round 5, VERDICT r4 #2b): the fresh token's
    K/V rows are MXINT8-encoded in-kernel and blended into the SW-lane
    STAGING ring (static-index-map aliased outputs — none of the
    data-dependent 128-lane main-window RMW that made the direct write move
    ~35 MB/layer to store 64 KB); attention then combines the main cache
    (positions < flushed) with the staging ring (positions [flushed, pos])
    flash-style — concatenated score blocks share one exact softmax.

    Numerics: staging lane j holds position t(j) = pos - ((pos - j) % SW);
    with SW a multiple of 16 and ``flushed`` 16-aligned, every probs
    16-group in ring space covers exactly one position 16-group, so the
    P-quantization grid is IDENTICAL to the unstaged kernel's — only the
    f32 softmax reduction order differs (concat tail vs in-place columns).
    """
    from .cache_write import _encode_t

    del idx_ref
    b = pl.program_id(0)
    pos = pos_ref[b]
    fl = fl_ref[b]
    qs = q_ref[0, :, 0, :].astype(jnp.float32)      # (Hq, d)
    H, d = qs.shape
    L = kc_ref.shape[3]
    kvh = kc_ref.shape[1]
    SW = ksc_ref.shape[3]

    if scale_query:
        qs = qs * scaling
    if q_mb is not None:
        qs = _quantize_sublane_groups_signed(qs.T, q_mb, group).T

    # ---- encode fresh rows + blend into the staging ring ----------------
    r = pos % SW
    pack = ksc_ref.shape[2] != d                    # MXINT4 nibble layout
    kvals = kh_ref[0, :, 0, :].astype(jnp.float32)  # (kc, d)
    vvals = vh_ref[0, :, 0, :].astype(jnp.float32)
    kcod, kexp = _encode_t(kvals.T, group, mb=cache_mb, pack=pack)
    vcod, vexp = _encode_t(vvals.T, group, mb=cache_mb, pack=pack)

    upd = {}
    for name, in_ref, out_ref, new_t in (
            ("kc", ksc_ref, ksc_o, kcod), ("ke", kse_ref, kse_o, kexp),
            ("vc", vsc_ref, vsc_o, vcod), ("ve", vse_ref, vse_o, vexp)):
        cur = in_ref[0].astype(jnp.float32)         # (kc, rows, SW)
        n = jnp.broadcast_to(new_t.T[:, :, None], cur.shape)
        lane = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 2)
        merged = jnp.where(lane == r, n, cur)
        out_ref[0] = merged.astype(out_ref.dtype)
        upd[name] = merged                          # post-write values

    # ---- masks -----------------------------------------------------------
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    ok_main = kv_idx < fl                            # main: [0, flushed)
    st_idx = jax.lax.broadcasted_iota(jnp.int32, (1, SW), 1)
    t_lane = pos - jnp.remainder(pos - st_idx, SW)   # position held by lane
    ok_st = t_lane >= fl                             # staging: [flushed, pos]

    def decode_t(c_ref, e_ref, kv):
        return _decode_cache_block(c_ref[0, kv], e_ref[0, kv], d, group, L,
                                   cache_mb, dot_dtype)

    def decode_stage(name_c, name_e, kv):
        return _decode_cache_block(upd[name_c][kv], upd[name_e][kv], d,
                                   group, SW, cache_mb, dot_dtype)

    # ---- phase 1: scores over main + staging -----------------------------
    rows_m, rows_s = [], []
    for kv in range(kvh):
        q_kv = qs[kv * n_rep:(kv + 1) * n_rep].astype(dot_dtype)
        rows_m.append(jax.lax.dot_general(
            q_kv, decode_t(kc_ref, ke_ref, kv),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        rows_s.append(jax.lax.dot_general(
            q_kv, decode_stage("kc", "ke", kv),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    s_m = rows_m[0] if kvh == 1 else jnp.concatenate(rows_m, axis=0)
    s_s = rows_s[0] if kvh == 1 else jnp.concatenate(rows_s, axis=0)
    if not scale_query:
        s_m = s_m * scaling
        s_s = s_s * scaling
    s = jnp.concatenate([jnp.where(ok_main, s_m, -jnp.inf),
                         jnp.where(ok_st, s_s, -jnp.inf)], axis=1)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)        # (Hq, L+SW)
    p_t = p.T                                        # (L+SW, Hq)
    if p_mb is not None:
        # 16-groups along axis 0: the L→SW seam is 16-aligned, and ring
        # lanes map 16-groups onto position 16-groups (see docstring)
        p_t = _quantize_sublane_groups(p_t, p_mb, group)
    p_t = p_t.astype(dot_dtype)
    p_main, p_st = p_t[:L], p_t[L:]

    # ---- phase 2: P·V over main + staging --------------------------------
    outs = []
    for kv in range(kvh):
        sl = slice(kv * n_rep, (kv + 1) * n_rep)
        o_t = jnp.dot(decode_t(vc_ref, ve_ref, kv), p_main[:, sl],
                      preferred_element_type=jnp.float32)
        o_t = o_t + jnp.dot(decode_stage("vc", "ve", kv), p_st[:, sl],
                            preferred_element_type=jnp.float32)
        outs.append(o_t.T)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    o_ref[0, :, 0, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scaling", "scale_query", "group", "q_width", "p_width",
                     "out_dtype", "interpret"),
)
def decode_attention_quantized_staged(
    q: jnp.ndarray,          # (B, H, 1, d) RAW queries (rope applied)
    k_codes: jnp.ndarray,    # (NL, B, KVH, d, L) int8 — MAIN cache
    k_exps: jnp.ndarray,     # (NL, B, KVH, d/16, L)
    v_codes: jnp.ndarray,
    v_exps: jnp.ndarray,
    ks_codes: jnp.ndarray,   # (NL, B, KVH, d, SW) int8 — staging ring
    ks_exps: jnp.ndarray,    # (NL, B, KVH, d/16, SW)
    vs_codes: jnp.ndarray,
    vs_exps: jnp.ndarray,
    kh: jnp.ndarray,         # (B, KVH, 1, d) RAW new K rows (pre-encode)
    vh: jnp.ndarray,
    positions: jnp.ndarray,  # (B,) int32
    flushed: jnp.ndarray,    # (B,) int32, 16-aligned
    layer_index,             # (1,) int32
    *,
    scaling: float,
    scale_query: bool = False,
    group: int = 16,
    q_width: int | None = 8,
    p_width: int | None = 8,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple:
    """Single-launch staged decode step over the layer-stacked MXINT8 cache:
    returns (attn (B, H, 1, d), ks_codes, ks_exps, vs_codes, vs_exps) with
    the STAGING arrays updated in place (aliased; the main cache is
    read-only here — `cache_write.flush_stage_to_main` migrates completed
    32-blocks once per 32 steps). No sliding-window support (the serving
    router keeps windowed configs on the direct-write path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, S, d = q.shape
    assert S == 1, S
    assert k_codes.ndim == 5, ("layer-stacked cache required", k_codes.shape)
    KVH, L = k_codes.shape[-3], k_codes.shape[-1]
    SW = ks_codes.shape[-1]
    cr = k_codes.shape[-2]               # d (MXINT8) or d/2 (MXINT4 packed)
    assert cr in (d, d // 2), k_codes.shape
    w4 = cr == d // 2
    n_rep = H // KVH
    assert d // k_exps.shape[-2] == group
    assert L % 128 == 0 and SW % group == 0, (L, SW, group)
    # per-head staging (4 arrays, in + aliased out, K+V) rides the same
    # VMEM as the main blocks — without accounting it a whole-KVH chunk at
    # L=512 overflowed the 16 MB scoped limit by 16 KB (round 5)
    stage_overhead = 4 * (cr + d // group) * SW * 2
    kc = _kvh_chunk(KVH, L, d, (0.5 if w4 else 1) + 1 / group,
                    budget=10 * 1024 * 1024, extra_per_head=stage_overhead)
    G, Hq = KVH // kc, kc * n_rep

    kernel = functools.partial(
        _kernel_quantized_staged, scaling=scaling, scale_query=scale_query,
        group=group, n_rep=n_rep, cache_mb=3.0 if w4 else 7.0,
        q_mb=None if q_width is None else q_width - 1,
        p_mb=None if p_width is None else p_width - 1,
        dot_dtype=jnp.float32 if interpret else jnp.bfloat16,
    )

    spec_c = pl.BlockSpec((None, 1, kc, cr, L),
                          lambda b, g, idx: (idx[0], b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec((None, 1, kc, d // group, L),
                          lambda b, g, idx: (idx[0], b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((None, 1, kc, cr, SW),
                           lambda b, g, idx: (idx[0], b, g, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_se = pl.BlockSpec((None, 1, kc, d // group, SW),
                           lambda b, g, idx: (idx[0], b, g, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_new = pl.BlockSpec((1, kc, 1, d), lambda b, g, idx: (b, g, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_q = pl.BlockSpec((1, Hq, 1, d), lambda b, g, idx: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_smem = pl.BlockSpec((B,), lambda b, g, idx: (0,),
                             memory_space=pltpu.SMEM)
    out_specs = [
        pl.BlockSpec((1, Hq, 1, d), lambda b, g, idx: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
        spec_sc, spec_se, spec_sc, spec_se,
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, H, 1, d), out_dtype),
        jax.ShapeDtypeStruct(ks_codes.shape, ks_codes.dtype),
        jax.ShapeDtypeStruct(ks_exps.shape, ks_exps.dtype),
        jax.ShapeDtypeStruct(vs_codes.shape, vs_codes.dtype),
        jax.ShapeDtypeStruct(vs_exps.shape, vs_exps.dtype),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, G),
        in_specs=[spec_smem, spec_smem, spec_q,
                  spec_c, spec_e, spec_c, spec_e,
                  spec_sc, spec_se, spec_sc, spec_se,
                  spec_new, spec_new],
        out_specs=out_specs,
    )
    # flat inputs: idx(0) pos(1) fl(2) q(3) kc(4) ke(5) vc(6) ve(7) ksc(8)
    # kse(9) vsc(10) vse(11) kh(12) vh(13); outputs: attn + 4 staging arrays
    aliases = {8: 1, 9: 2, 10: 3, 11: 4}
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * (L + SW) * d,
            bytes_accessed=2 * B * KVH * (L + 2 * SW) * (d + d // group),
            transcendentals=B * H * (L + SW),
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_index, jnp.int32).reshape(1),
        positions.astype(jnp.int32), flushed.astype(jnp.int32),
        q, k_codes, k_exps, v_codes, v_exps,
        ks_codes, ks_exps, vs_codes, vs_exps,
        kh.astype(jnp.float32), vh.astype(jnp.float32),
    )
    return res


# ---------------------------------------------------------------------------
# Streaming (chunked-L) decode attention — contexts beyond VMEM residency
# ---------------------------------------------------------------------------
def _stats_kernel(*refs, scaling, scale_query, window, group, q_mb, n_rep,
                  cache_mb, l_chunk, dot_dtype, drop_scalar):
    """Pass 1: running softmax stats (max, online-rescaled denom) over the
    L chunks. Grid (B, G, LC); scratch carries (m, denom) across the
    innermost chunk dimension."""
    if drop_scalar:
        refs = refs[1:]
    pos_ref, q_ref, kc_ref, ke_ref, o_ref, acc = refs
    b = pl.program_id(0)
    lc = pl.program_id(2)
    n_lc = pl.num_programs(2)
    pos = pos_ref[b]
    qs = q_ref[0, :, 0, :].astype(jnp.float32)      # (H_blk, d)
    H, d = qs.shape
    kvh = kc_ref.shape[1]

    if scale_query:
        qs = qs * scaling
    if q_mb is not None:
        qs = _quantize_sublane_groups_signed(qs.T, q_mb, group).T

    base = lc * l_chunk
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, l_chunk), 1) + base
    ok = kv_idx <= pos
    if window is not None:
        ok = jnp.logical_and(ok, kv_idx > pos - window)

    def decode_t(c_ref, e_ref, kv):
        return _decode_cache_block(c_ref[0, kv], e_ref[0, kv], d, group,
                                   l_chunk, cache_mb, dot_dtype)

    rows = []
    for kv in range(kvh):
        ktd = decode_t(kc_ref, ke_ref, kv)
        q_kv = qs[kv * n_rep:(kv + 1) * n_rep]
        rows.append(jax.lax.dot_general(
            q_kv.astype(dot_dtype), ktd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    s = rows[0] if kvh == 1 else jnp.concatenate(rows, axis=0)  # (H_blk, Lc)
    if not scale_query:
        s = s * scaling
    s = jnp.where(ok, s, -jnp.inf)
    m_c = jnp.max(s, axis=1, keepdims=True).T       # (1, H_blk)

    @pl.when(lc == 0)
    def _():
        acc[0:1, :] = jnp.full((1, H), -jnp.inf, jnp.float32)
        acc[1:2, :] = jnp.zeros((1, H), jnp.float32)

    m_old = acc[0:1, :]                             # (1, H_blk)
    m_new = jnp.maximum(m_old, m_c)
    # exp(-inf - -inf) guard: a chunk (or the running state) with no valid
    # slots has m = -inf; its rescale factor must be 0, not NaN
    resc = jnp.where(m_old == -jnp.inf, 0.0, jnp.exp(m_old - m_new))
    d_c = jnp.sum(jnp.exp(s - m_new.T), axis=1,
                  keepdims=True).T                  # masked slots: e^-inf=0
    acc[1:2, :] = acc[1:2, :] * resc + d_c
    acc[0:1, :] = m_new

    @pl.when(lc == n_lc - 1)
    def _():
        o_ref[...] = acc[...]


def _out_kernel(*refs, scaling, scale_query, window, group, q_mb, p_mb,
                n_rep, cache_mb, l_chunk, dot_dtype, drop_scalar):
    """Pass 2: with final (m, denom) known, each chunk's probs quantize with
    the FINAL stats (the 16-token quantization groups lie within chunks, so
    per-chunk quantization equals whole-row quantization exactly given the
    same p values); o accumulates over chunks in scratch."""
    if drop_scalar:
        refs = refs[1:]
    pos_ref, q_ref, kc_ref, ke_ref, vc_ref, ve_ref, st_ref, o_ref, acc = refs
    b = pl.program_id(0)
    lc = pl.program_id(2)
    n_lc = pl.num_programs(2)
    pos = pos_ref[b]
    qs = q_ref[0, :, 0, :].astype(jnp.float32)
    H, d = qs.shape
    kvh = kc_ref.shape[1]

    if scale_query:
        qs = qs * scaling
    if q_mb is not None:
        qs = _quantize_sublane_groups_signed(qs.T, q_mb, group).T

    base = lc * l_chunk
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, l_chunk), 1) + base
    ok = kv_idx <= pos
    if window is not None:
        ok = jnp.logical_and(ok, kv_idx > pos - window)

    def decode_t(c_ref, e_ref, kv):
        return _decode_cache_block(c_ref[0, kv], e_ref[0, kv], d, group,
                                   l_chunk, cache_mb, dot_dtype)

    m = st_ref[0:1, :].T if st_ref.ndim == 2 else st_ref[0, 0:1, :].T
    denom = st_ref[1:2, :].T if st_ref.ndim == 2 else st_ref[0, 1:2, :].T
    denom = jnp.where(denom == 0.0, 1.0, denom)     # fully-masked row guard

    rows = []
    for kv in range(kvh):
        ktd = decode_t(kc_ref, ke_ref, kv)
        q_kv = qs[kv * n_rep:(kv + 1) * n_rep]
        rows.append(jax.lax.dot_general(
            q_kv.astype(dot_dtype), ktd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    s = rows[0] if kvh == 1 else jnp.concatenate(rows, axis=0)  # (H_blk, Lc)
    if not scale_query:
        s = s * scaling
    s = jnp.where(ok, s, -jnp.inf)
    p = jnp.exp(s - m) / denom                      # (H_blk, Lc)
    p_t = p.T                                       # (Lc, H_blk)
    if p_mb is not None:
        p_t = _quantize_sublane_groups(p_t, p_mb, group)
    p_t = p_t.astype(dot_dtype)

    @pl.when(lc == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for kv in range(kvh):
        vtd = decode_t(vc_ref, ve_ref, kv)
        o_t = jnp.dot(vtd, p_t[:, kv * n_rep:(kv + 1) * n_rep],
                      preferred_element_type=jnp.float32)   # (d, n_rep)
        acc[kv * n_rep:(kv + 1) * n_rep, :] += o_t.T

    @pl.when(lc == n_lc - 1)
    def _():
        o_ref[0, :, 0, :] = acc[...].astype(o_ref.dtype)


def streaming_l_chunk(L: int, group: int = 16,
                      target: int = 2048) -> int | None:
    """Largest divisor of ``L`` that is <= ``target`` and a multiple of
    ``group`` — the streaming kernel's L-chunk (it asserts
    ``L % l_chunk == 0``). Auto-selection (ADVICE r4): a 16-aligned L above
    the VMEM wall that is not a multiple of 2048 must not trap the trace;
    128-multiples are preferred (full-lane chunks), any group-multiple
    divisor is accepted otherwise. Returns None only when L has no
    group-multiple divisor <= target (i.e. L % group != 0)."""
    for step in (128, group):
        for c in range(target - target % step, step - 1, -step):
            if L % c == 0:
                return c
    return None


@functools.partial(
    jax.jit,
    static_argnames=("scaling", "scale_query", "window", "group",
                     "q_width", "p_width", "l_chunk", "out_dtype",
                     "interpret"),
)
def decode_attention_quantized_streaming(
    q: jnp.ndarray,          # (B, H, 1, d)
    k_codes: jnp.ndarray,    # (B, KVH, d, L) int8 — or (NL, ...) + layer_index
    k_exps: jnp.ndarray,     # (B, KVH, d/16, L) int8
    v_codes: jnp.ndarray,
    v_exps: jnp.ndarray,
    positions: jnp.ndarray,
    *,
    scaling: float,
    scale_query: bool = False,
    window: int | None = None,
    group: int = 16,
    q_width: int | None = 8,
    p_width: int | None = 8,
    l_chunk: int = 2048,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
    layer_index=None,
) -> jnp.ndarray:
    """Two-pass streaming decode attention over the MXINT8 cache for
    contexts that do not fit whole-L in VMEM (L > ~22K at d=128 with the
    12 MB head-chunk budget — `_kvh_chunk`'s wall, r3 VERDICT item 6).

    Pass 1 streams K chunk-by-chunk computing softmax stats (running max,
    online-rescaled denominator); pass 2 streams K and V again, quantizing
    each chunk's probs with the FINAL stats — the 16-token probs
    quantization groups lie inside chunks (l_chunk % 16 == 0), so given
    identical p values this equals the one-pass kernel's whole-row
    quantization. K is read twice (2·K + V ≈ 1.5× the one-pass stream).

    Numerics: the online-rescaled denominator and the chunked o
    accumulation differ from the one-pass kernel / eager path only in f32
    accumulation order — tests pin allclose at 2e-3 against eager on the
    decoded cache (the same contract as the prefill flash kernel), not
    bitwise.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, S, d = q.shape
    assert S == 1, S
    indexed = layer_index is not None
    assert k_codes.ndim == (5 if indexed else 4), k_codes.shape
    KVH, L = k_codes.shape[-3], k_codes.shape[-1]
    cr = k_codes.shape[-2]
    assert cr in (d, d // 2), k_codes.shape
    w4 = cr == d // 2
    n_rep = H // KVH
    assert d // k_exps.shape[-2] == group
    assert L % l_chunk == 0 and l_chunk % group == 0, (L, l_chunk, group)
    n_lc = L // l_chunk

    # head chunk: whole-L residency replaced by l_chunk residency
    kc = _kvh_chunk(KVH, l_chunk, d, (0.5 if w4 else 1) + 1 / group)
    G, Hq = KVH // kc, kc * n_rep
    q_mb = None if q_width is None else q_width - 1
    p_mb = None if p_width is None else p_width - 1

    def im(f):
        return (lambda b, g, lc, idx: f(b, g, lc)) if indexed else f

    def im_w(f):
        return (lambda b, g, lc, idx: (idx[0], *f(b, g, lc))) if indexed \
            else f

    def wshape(shape):
        return (None, *shape) if indexed else shape

    spec_c = pl.BlockSpec(wshape((1, kc, cr, l_chunk)),
                          im_w(lambda b, g, lc: (b, g, 0, lc)),
                          memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec(wshape((1, kc, d // group, l_chunk)),
                          im_w(lambda b, g, lc: (b, g, 0, lc)),
                          memory_space=pltpu.VMEM)
    spec_pos = pl.BlockSpec((B,), im(lambda b, g, lc: (0,)),
                            memory_space=pltpu.SMEM)
    spec_q = pl.BlockSpec((1, Hq, 1, d), im(lambda b, g, lc: (b, g, 0, 0)),
                          memory_space=pltpu.VMEM)
    args0 = (positions.astype(jnp.int32), q)
    pref = ((jnp.asarray(layer_index, jnp.int32).reshape(1),)
            if indexed else ())

    # ---- pass 1: stats ----
    # stats live (B, G, 2, Hq): the (2, Hq) trailing block EQUALS the array
    # dims (Mosaic requires trailing block dims divisible by (8, 128) OR
    # equal to the array dims — Hq is 8-64 here)
    stats_spec = pl.BlockSpec((None, None, 2, Hq),
                              im(lambda b, g, lc: (b, g, 0, 0)),
                              memory_space=pltpu.VMEM)
    dot_dtype = jnp.float32 if interpret else jnp.bfloat16
    kern1 = functools.partial(
        _stats_kernel, scaling=scaling, scale_query=scale_query,
        window=window, group=group, q_mb=q_mb, n_rep=n_rep,
        cache_mb=3.0 if w4 else 7.0,
        l_chunk=l_chunk, dot_dtype=dot_dtype, drop_scalar=indexed)
    grid_spec1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if indexed else 0,
        grid=(B, G, n_lc),
        in_specs=[spec_pos, spec_q, spec_c, spec_e],
        out_specs=stats_spec,
        scratch_shapes=[pltpu.VMEM((2, Hq), jnp.float32)],
    )
    stats = pl.pallas_call(
        kern1,
        grid_spec=grid_spec1,
        out_shape=jax.ShapeDtypeStruct((B, G, 2, Hq), jnp.float32),
        interpret=interpret,
    )(*pref, *args0, k_codes, k_exps)

    # ---- pass 2: output ----
    kern2 = functools.partial(
        _out_kernel, scaling=scaling, scale_query=scale_query,
        window=window, group=group, q_mb=q_mb, p_mb=p_mb, n_rep=n_rep,
        cache_mb=3.0 if w4 else 7.0, l_chunk=l_chunk, dot_dtype=dot_dtype,
        drop_scalar=indexed)
    st_spec = pl.BlockSpec((None, None, 2, Hq),
                           im(lambda b, g, lc: (b, g, 0, 0)),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, Hq, 1, d), im(lambda b, g, lc: (b, g, 0, 0)),
                            memory_space=pltpu.VMEM)
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if indexed else 0,
        grid=(B, G, n_lc),
        in_specs=[spec_pos, spec_q, spec_c, spec_e, spec_c, spec_e, st_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((Hq, d), jnp.float32)],
    )
    return pl.pallas_call(
        kern2,
        grid_spec=grid_spec2,
        out_shape=jax.ShapeDtypeStruct((B, H, 1, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * L * d,
            bytes_accessed=3 * B * KVH * L * (d + d // group),
            transcendentals=2 * B * H * L,
        ),
        interpret=interpret,
    )(*pref, *args0, k_codes, k_exps, v_codes, v_exps, stats)


# ---------------------------------------------------------------------------
# Staged streaming decode attention (round 5, VERDICT r4 #5): ring-staged
# writes + two-pass chunked-L attention, staging folded into both passes
# ---------------------------------------------------------------------------
def _stage_decode(upd, name_c, name_e, kv, d, group, SW, cache_mb,
                  dot_dtype):
    return _decode_cache_block(upd[name_c][kv], upd[name_e][kv], d, group,
                               SW, cache_mb, dot_dtype)


def _stage_blend(pos, refs_in, refs_out, kcod, kexp, vcod, vexp, SW):
    """Blend the fresh encoded rows into the staging ring at lane pos % SW;
    write the aliased outputs and return the post-write values."""
    r = pos % SW
    upd = {}
    for name, in_ref, out_ref, new_t in (
            ("kc", refs_in[0], refs_out[0], kcod),
            ("ke", refs_in[1], refs_out[1], kexp),
            ("vc", refs_in[2], refs_out[2], vcod),
            ("ve", refs_in[3], refs_out[3], vexp)):
        cur = in_ref[0].astype(jnp.float32)         # (kc, rows, SW)
        n = jnp.broadcast_to(new_t.T[:, :, None], cur.shape)
        lane = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 2)
        merged = jnp.where(lane == r, n, cur)
        out_ref[0] = merged.astype(out_ref.dtype)
        upd[name] = merged
    return upd


def _stats_kernel_staged(idx_ref, pos_ref, fl_ref, q_ref, kc_ref, ke_ref,
                         ksc_ref, kse_ref, vsc_ref, vse_ref, kh_ref, vh_ref,
                         st_o, ksc_o, kse_o, vsc_o, vse_o, acc,
                         *, scaling, scale_query, group, q_mb, n_rep,
                         cache_mb, l_chunk, dot_dtype):
    """Pass 1 of the staged streaming step: running stats over the MAIN
    chunks (positions < flushed) + the staging ring folded in at the last
    chunk; the fresh token's K/V rows are encoded and blended into the
    (aliased) staging outputs — the direct-write RMW and its launch both
    disappear in the streaming regime too."""
    from .cache_write import _encode_t

    del idx_ref
    b = pl.program_id(0)
    lc = pl.program_id(2)
    n_lc = pl.num_programs(2)
    pos = pos_ref[b]
    fl = fl_ref[b]
    qs = q_ref[0, :, 0, :].astype(jnp.float32)
    H, d = qs.shape
    kvh = kc_ref.shape[1]
    SW = ksc_ref.shape[3]

    if scale_query:
        qs = qs * scaling
    if q_mb is not None:
        qs = _quantize_sublane_groups_signed(qs.T, q_mb, group).T

    pack = ksc_ref.shape[2] != d                    # MXINT4 nibble layout
    kvals = kh_ref[0, :, 0, :].astype(jnp.float32)
    vvals = vh_ref[0, :, 0, :].astype(jnp.float32)
    kcod, kexp = _encode_t(kvals.T, group, mb=cache_mb, pack=pack)
    vcod, vexp = _encode_t(vvals.T, group, mb=cache_mb, pack=pack)
    upd = _stage_blend(pos, (ksc_ref, kse_ref, vsc_ref, vse_ref),
                       (ksc_o, kse_o, vsc_o, vse_o),
                       kcod, kexp, vcod, vexp, SW)

    base = lc * l_chunk
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, l_chunk), 1) + base
    ok = kv_idx < fl                                 # main: [0, flushed)

    def decode_t(c_ref, e_ref, kv):
        return _decode_cache_block(c_ref[0, kv], e_ref[0, kv], d, group,
                                   l_chunk, cache_mb, dot_dtype)

    rows = []
    for kv in range(kvh):
        ktd = decode_t(kc_ref, ke_ref, kv)
        q_kv = qs[kv * n_rep:(kv + 1) * n_rep]
        rows.append(jax.lax.dot_general(
            q_kv.astype(dot_dtype), ktd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    s = rows[0] if kvh == 1 else jnp.concatenate(rows, axis=0)
    if not scale_query:
        s = s * scaling
    s = jnp.where(ok, s, -jnp.inf)
    m_c = jnp.max(s, axis=1, keepdims=True).T

    @pl.when(lc == 0)
    def _():
        acc[0:1, :] = jnp.full((1, H), -jnp.inf, jnp.float32)
        acc[1:2, :] = jnp.zeros((1, H), jnp.float32)

    m_old = acc[0:1, :]
    m_new = jnp.maximum(m_old, m_c)
    resc = jnp.where(m_old == -jnp.inf, 0.0, jnp.exp(m_old - m_new))
    d_c = jnp.sum(jnp.exp(s - m_new.T), axis=1, keepdims=True).T
    acc[1:2, :] = acc[1:2, :] * resc + d_c
    acc[0:1, :] = m_new

    @pl.when(lc == n_lc - 1)
    def _():
        # fold the staging ring in as the final block
        st_idx = jax.lax.broadcasted_iota(jnp.int32, (1, SW), 1)
        t_lane = pos - jnp.remainder(pos - st_idx, SW)
        ok_st = t_lane >= fl
        rows_s = []
        for kv in range(kvh):
            kst = _stage_decode(upd, "kc", "ke", kv, d, group, SW,
                                cache_mb, dot_dtype)
            q_kv = qs[kv * n_rep:(kv + 1) * n_rep]
            rows_s.append(jax.lax.dot_general(
                q_kv.astype(dot_dtype), kst,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        s_s = rows_s[0] if kvh == 1 else jnp.concatenate(rows_s, axis=0)
        if not scale_query:
            s_s = s_s * scaling
        s_s = jnp.where(ok_st, s_s, -jnp.inf)
        m_c2 = jnp.max(s_s, axis=1, keepdims=True).T
        m_old2 = acc[0:1, :]
        m_new2 = jnp.maximum(m_old2, m_c2)
        resc2 = jnp.where(m_old2 == -jnp.inf, 0.0, jnp.exp(m_old2 - m_new2))
        d_c2 = jnp.sum(jnp.exp(s_s - m_new2.T), axis=1, keepdims=True).T
        st_o[0:1, :] = m_new2
        st_o[1:2, :] = acc[1:2, :] * resc2 + d_c2


def _out_kernel_staged(idx_ref, pos_ref, fl_ref, q_ref, kc_ref, ke_ref,
                       vc_ref, ve_ref, ksc_ref, kse_ref, vsc_ref, vse_ref,
                       st_ref, o_ref, acc,
                       *, scaling, scale_query, group, q_mb, p_mb, n_rep,
                       cache_mb, l_chunk, dot_dtype):
    """Pass 2: chunked P·V over the main cache (positions < flushed) with
    final stats, plus the staging ring's contribution at the last chunk.
    Staging inputs arrive POST-pass-1 (aliased write), so the fresh token
    is already in the ring."""
    del idx_ref
    b = pl.program_id(0)
    lc = pl.program_id(2)
    n_lc = pl.num_programs(2)
    pos = pos_ref[b]
    fl = fl_ref[b]
    qs = q_ref[0, :, 0, :].astype(jnp.float32)
    H, d = qs.shape
    kvh = kc_ref.shape[1]
    SW = ksc_ref.shape[3]

    if scale_query:
        qs = qs * scaling
    if q_mb is not None:
        qs = _quantize_sublane_groups_signed(qs.T, q_mb, group).T

    base = lc * l_chunk
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, l_chunk), 1) + base
    ok = kv_idx < fl

    def decode_t(c_ref, e_ref, kv):
        return _decode_cache_block(c_ref[0, kv], e_ref[0, kv], d, group,
                                   l_chunk, cache_mb, dot_dtype)

    m = (st_ref[0:1, :] if st_ref.ndim == 2 else st_ref[0, 0:1, :]).T
    denom = (st_ref[1:2, :] if st_ref.ndim == 2 else st_ref[0, 1:2, :]).T
    denom = jnp.where(denom == 0.0, 1.0, denom)

    rows = []
    for kv in range(kvh):
        ktd = decode_t(kc_ref, ke_ref, kv)
        q_kv = qs[kv * n_rep:(kv + 1) * n_rep]
        rows.append(jax.lax.dot_general(
            q_kv.astype(dot_dtype), ktd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    s = rows[0] if kvh == 1 else jnp.concatenate(rows, axis=0)
    if not scale_query:
        s = s * scaling
    s = jnp.where(ok, s, -jnp.inf)
    p = jnp.exp(s - m) / denom
    p_t = p.T
    if p_mb is not None:
        p_t = _quantize_sublane_groups(p_t, p_mb, group)
    p_t = p_t.astype(dot_dtype)

    @pl.when(lc == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for kv in range(kvh):
        vtd = decode_t(vc_ref, ve_ref, kv)
        o_t = jnp.dot(vtd, p_t[:, kv * n_rep:(kv + 1) * n_rep],
                      preferred_element_type=jnp.float32)
        acc[kv * n_rep:(kv + 1) * n_rep, :] += o_t.T

    @pl.when(lc == n_lc - 1)
    def _():
        st_idx = jax.lax.broadcasted_iota(jnp.int32, (1, SW), 1)
        t_lane = pos - jnp.remainder(pos - st_idx, SW)
        ok_st = t_lane >= fl
        upd = {"kc": ksc_ref[0].astype(jnp.float32),
               "ke": kse_ref[0].astype(jnp.float32),
               "vc": vsc_ref[0].astype(jnp.float32),
               "ve": vse_ref[0].astype(jnp.float32)}
        rows_s = []
        for kv in range(kvh):
            kst = _stage_decode(upd, "kc", "ke", kv, d, group, SW,
                                cache_mb, dot_dtype)
            q_kv = qs[kv * n_rep:(kv + 1) * n_rep]
            rows_s.append(jax.lax.dot_general(
                q_kv.astype(dot_dtype), kst,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        s_s = rows_s[0] if kvh == 1 else jnp.concatenate(rows_s, axis=0)
        if not scale_query:
            s_s = s_s * scaling
        s_s = jnp.where(ok_st, s_s, -jnp.inf)
        p_s = jnp.exp(s_s - m) / denom
        p_s_t = p_s.T
        if p_mb is not None:
            p_s_t = _quantize_sublane_groups(p_s_t, p_mb, group)
        p_s_t = p_s_t.astype(dot_dtype)
        for kv in range(kvh):
            vst = _stage_decode(upd, "vc", "ve", kv, d, group, SW,
                                cache_mb, dot_dtype)
            o_t = jnp.dot(vst, p_s_t[:, kv * n_rep:(kv + 1) * n_rep],
                          preferred_element_type=jnp.float32)
            acc[kv * n_rep:(kv + 1) * n_rep, :] += o_t.T
        o_ref[0, :, 0, :] = acc[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scaling", "scale_query", "group", "q_width", "p_width",
                     "l_chunk", "out_dtype", "interpret"),
)
def decode_attention_quantized_streaming_staged(
    q: jnp.ndarray,          # (B, H, 1, d)
    k_codes: jnp.ndarray,    # (NL, B, KVH, d, L) — layer-stacked ONLY
    k_exps: jnp.ndarray,
    v_codes: jnp.ndarray,
    v_exps: jnp.ndarray,
    ks_codes: jnp.ndarray,   # (NL, B, KVH, d, SW) staging ring
    ks_exps: jnp.ndarray,
    vs_codes: jnp.ndarray,
    vs_exps: jnp.ndarray,
    kh: jnp.ndarray,         # (B, KVH, 1, d) RAW new rows
    vh: jnp.ndarray,
    positions: jnp.ndarray,  # (B,)
    flushed: jnp.ndarray,    # (B,) 16-aligned
    layer_index,             # (1,)
    *,
    scaling: float,
    scale_query: bool = False,
    group: int = 16,
    q_width: int | None = 8,
    p_width: int | None = 8,
    l_chunk: int = 2048,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple:
    """Single logical step for the streaming-L regime with the ring-staged
    cache: pass 1 writes the fresh token into the staging ring (aliased)
    and computes softmax stats over main chunks + ring; pass 2 accumulates
    P·V over main chunks + ring. Returns (attn, ks_codes, ks_exps,
    vs_codes, vs_exps). No sliding-window support."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, S, d = q.shape
    assert S == 1, S
    assert k_codes.ndim == 5, ("layer-stacked cache required", k_codes.shape)
    KVH, L = k_codes.shape[-3], k_codes.shape[-1]
    SW = ks_codes.shape[-1]
    cr = k_codes.shape[-2]
    assert cr in (d, d // 2), k_codes.shape
    w4 = cr == d // 2
    n_rep = H // KVH
    assert d // k_exps.shape[-2] == group
    assert L % l_chunk == 0 and l_chunk % group == 0, (L, l_chunk, group)
    assert SW % group == 0, SW
    n_lc = L // l_chunk
    stage_overhead = 4 * (cr + d // group) * SW * 2
    kc = _kvh_chunk(KVH, l_chunk, d, (0.5 if w4 else 1) + 1 / group,
                    budget=10 * 1024 * 1024, extra_per_head=stage_overhead)
    G, Hq = KVH // kc, kc * n_rep
    q_mb = None if q_width is None else q_width - 1
    p_mb = None if p_width is None else p_width - 1
    dot_dtype = jnp.float32 if interpret else jnp.bfloat16

    def iw(f):
        return lambda b, g, lc, idx: (idx[0], *f(b, g, lc))

    def i0(f):
        return lambda b, g, lc, idx: f(b, g, lc)

    spec_c = pl.BlockSpec((None, 1, kc, cr, l_chunk),
                          iw(lambda b, g, lc: (b, g, 0, lc)),
                          memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec((None, 1, kc, d // group, l_chunk),
                          iw(lambda b, g, lc: (b, g, 0, lc)),
                          memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((None, 1, kc, cr, SW),
                           iw(lambda b, g, lc: (b, g, 0, 0)),
                           memory_space=pltpu.VMEM)
    spec_se = pl.BlockSpec((None, 1, kc, d // group, SW),
                           iw(lambda b, g, lc: (b, g, 0, 0)),
                           memory_space=pltpu.VMEM)
    spec_new = pl.BlockSpec((1, kc, 1, d), i0(lambda b, g, lc: (b, g, 0, 0)),
                            memory_space=pltpu.VMEM)
    spec_q = pl.BlockSpec((1, Hq, 1, d), i0(lambda b, g, lc: (b, g, 0, 0)),
                          memory_space=pltpu.VMEM)
    spec_smem = pl.BlockSpec((B,), i0(lambda b, g, lc: (0,)),
                             memory_space=pltpu.SMEM)
    stats_spec = pl.BlockSpec((None, None, 2, Hq),
                              i0(lambda b, g, lc: (b, g, 0, 0)),
                              memory_space=pltpu.VMEM)

    li = jnp.asarray(layer_index, jnp.int32).reshape(1)
    pos32 = positions.astype(jnp.int32)
    fl32 = flushed.astype(jnp.int32)

    # ---- pass 1: stats + staging write ----
    kern1 = functools.partial(
        _stats_kernel_staged, scaling=scaling, scale_query=scale_query,
        group=group, q_mb=q_mb, n_rep=n_rep, cache_mb=3.0 if w4 else 7.0,
        l_chunk=l_chunk, dot_dtype=dot_dtype)
    grid_spec1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, G, n_lc),
        in_specs=[spec_smem, spec_smem, spec_q, spec_c, spec_e,
                  spec_sc, spec_se, spec_sc, spec_se, spec_new, spec_new],
        out_specs=[stats_spec, spec_sc, spec_se, spec_sc, spec_se],
        scratch_shapes=[pltpu.VMEM((2, Hq), jnp.float32)],
    )
    # flat inputs: idx(0) pos(1) fl(2) q(3) kc(4) ke(5) ksc(6) kse(7)
    # vsc(8) vse(9) kh(10) vh(11); outputs: stats(0) + 4 staging arrays
    stats, ksc2, kse2, vsc2, vse2 = pl.pallas_call(
        kern1,
        grid_spec=grid_spec1,
        out_shape=[
            jax.ShapeDtypeStruct((B, G, 2, Hq), jnp.float32),
            jax.ShapeDtypeStruct(ks_codes.shape, ks_codes.dtype),
            jax.ShapeDtypeStruct(ks_exps.shape, ks_exps.dtype),
            jax.ShapeDtypeStruct(vs_codes.shape, vs_codes.dtype),
            jax.ShapeDtypeStruct(vs_exps.shape, vs_exps.dtype),
        ],
        input_output_aliases={6: 1, 7: 2, 8: 3, 9: 4},
        interpret=interpret,
    )(li, pos32, fl32, q, k_codes, k_exps,
      ks_codes, ks_exps, vs_codes, vs_exps,
      kh.astype(jnp.float32), vh.astype(jnp.float32))

    # ---- pass 2: output over main + ring (ring now holds the fresh token)
    kern2 = functools.partial(
        _out_kernel_staged, scaling=scaling, scale_query=scale_query,
        group=group, q_mb=q_mb, p_mb=p_mb, n_rep=n_rep,
        cache_mb=3.0 if w4 else 7.0, l_chunk=l_chunk, dot_dtype=dot_dtype)
    out_spec = pl.BlockSpec((1, Hq, 1, d),
                            i0(lambda b, g, lc: (b, g, 0, 0)),
                            memory_space=pltpu.VMEM)
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, G, n_lc),
        in_specs=[spec_smem, spec_smem, spec_q, spec_c, spec_e, spec_c,
                  spec_e, spec_sc, spec_se, spec_sc, spec_se, stats_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((Hq, d), jnp.float32)],
    )
    attn = pl.pallas_call(
        kern2,
        grid_spec=grid_spec2,
        out_shape=jax.ShapeDtypeStruct((B, H, 1, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * (L + SW) * d,
            bytes_accessed=3 * B * KVH * (L + 2 * SW) * (d + d // group),
            transcendentals=2 * B * H * (L + SW),
        ),
        interpret=interpret,
    )(li, pos32, fl32, q, k_codes, k_exps, v_codes, v_exps,
      ksc2, kse2, vsc2, vse2, stats)
    return attn, ksc2, kse2, vsc2, vse2


# ---------------------------------------------------------------------------
# Fused write+attend: cache insert merged into the attention kernel
# ---------------------------------------------------------------------------
def _kernel_quantized_write(idx_ref, pos_ref, q_ref, kc_ref, ke_ref, vc_ref,
                            ve_ref, kh_ref, vh_ref, o_ref, kcw_ref, kew_ref,
                            vcw_ref, vew_ref, *, scaling, scale_query,
                            window, group, q_mb, p_mb, n_rep, cache_mb,
                            dot_dtype):
    """`_kernel_quantized_body` + the cache write in ONE launch: the fresh
    token's K/V rows are MXINT8-encoded in-kernel (`cache_write._encode_t`,
    byte-identical to the standalone write kernel), blended into the score/
    value compute at lane ``pos`` (bitwise equal to write-then-attend — dot
    columns are independent), and written back through aliased 128-lane
    window outputs SLICED FROM THE ALREADY-RESIDENT SLAB — no separate
    window read, no separate launch (the standalone write kernel's RMW read
    half and its launch both disappear)."""
    from .cache_write import LANEBLK, _encode_t

    del idx_ref  # consumed by the BlockSpec index maps
    b = pl.program_id(0)
    pos = pos_ref[b]
    base = pl.multiple_of((pos // LANEBLK) * LANEBLK, LANEBLK)
    r = pos % LANEBLK
    qs = q_ref[0, :, 0, :].astype(jnp.float32)      # (H_blk, d)
    H, d = qs.shape
    L = kc_ref.shape[3]
    kvh = kc_ref.shape[1]

    if scale_query:
        qs = qs * scaling
    if q_mb is not None:
        qs = _quantize_sublane_groups_signed(qs.T, q_mb, group).T

    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    ok = kv_idx <= pos
    if window is not None:
        ok = jnp.logical_and(ok, kv_idx > pos - window)

    # ---- encode the fresh rows for this head chunk --------------------
    kvals = kh_ref[0, :, 0, :].astype(jnp.float32)  # (kc, d)
    vvals = vh_ref[0, :, 0, :].astype(jnp.float32)
    kcod, kexp = _encode_t(kvals.T, group)          # (d, kc), (d/g, kc)
    vcod, vexp = _encode_t(vvals.T, group)

    def rt(cod, exp):
        """roundtrip decode — identical math to decode_t below."""
        scale = jnp.exp2(exp - cache_mb)
        return (cod.reshape(d // group, group, kvh) * scale[:, None, :]
                ).reshape(d, kvh).astype(dot_dtype)

    kfresh = rt(kcod, kexp)                          # (d, kvh)
    vfresh = rt(vcod, vexp)

    def decode_t(c_ref, e_ref, kv):
        c = c_ref[0, kv].astype(jnp.float32)         # (d, L)
        e = e_ref[0, kv].astype(jnp.float32)         # (d/g, L)
        scale = jnp.exp2(e - cache_mb)
        return (c.reshape(d // group, group, L) * scale[:, None, :]
                ).reshape(d, L).astype(dot_dtype)

    # ---- phase 1: scores (stale column pos replaced by the fresh one) --
    rows = []
    for kv in range(kvh):
        ktd = decode_t(kc_ref, ke_ref, kv)
        q_kv = qs[kv * n_rep:(kv + 1) * n_rep].astype(dot_dtype)
        s_kv = jax.lax.dot_general(
            q_kv, ktd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_new = jax.lax.dot_general(
            q_kv, kfresh[:, kv:kv + 1],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (n_rep, 1)
        rows.append(jnp.where(kv_idx == pos, s_new, s_kv))
    s = rows[0] if kvh == 1 else jnp.concatenate(rows, axis=0)
    if not scale_query:
        s = s * scaling
    s = jnp.where(ok, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    p_t = p.T
    if p_mb is not None:
        p_t = _quantize_sublane_groups(p_t, p_mb, group)
    p_t = p_t.astype(dot_dtype)

    # ---- phase 2: P·V (stale V column replaced likewise) ---------------
    outs = []
    for kv in range(kvh):
        vtd = decode_t(vc_ref, ve_ref, kv)
        vtd = jnp.where(kv_idx == pos, vfresh[:, kv:kv + 1], vtd)
        o_t = jnp.dot(vtd, p_t[:, kv * n_rep:(kv + 1) * n_rep],
                      preferred_element_type=jnp.float32)
        outs.append(o_t.T)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    o_ref[0, :, 0, :] = out.astype(o_ref.dtype)

    # ---- write-back: blend fresh columns into the slab's lane window ---
    for slab_ref, w_ref, new_t in ((kc_ref, kcw_ref, kcod),
                                   (ke_ref, kew_ref, kexp),
                                   (vc_ref, vcw_ref, vcod),
                                   (ve_ref, vew_ref, vexp)):
        win = slab_ref[0, :, :, pl.ds(base, LANEBLK)]   # (kc, *, 128)
        n = jnp.broadcast_to(
            new_t.T[:, :, None].astype(win.dtype), win.shape)
        lane = jax.lax.broadcasted_iota(jnp.int32, win.shape, 2)
        w_ref[0, :, :, :] = jnp.where(lane == r, n, win)


@functools.partial(
    jax.jit,
    static_argnames=("scaling", "scale_query", "window", "group",
                     "q_width", "p_width", "out_dtype", "interpret"),
)
def decode_attention_quantized_write(
    q: jnp.ndarray,          # (B, H, 1, d) RAW queries (rope applied)
    k_codes: jnp.ndarray,    # (NL, B, KVH, d, L) int8 (layer-stacked ONLY)
    k_exps: jnp.ndarray,     # (NL, B, KVH, d/16, L)
    v_codes: jnp.ndarray,
    v_exps: jnp.ndarray,
    kh: jnp.ndarray,         # (B, KVH, 1, d) RAW new K rows (pre-encode)
    vh: jnp.ndarray,
    positions: jnp.ndarray,  # (B,) int32
    layer_index,             # (1,) int32
    *,
    scaling: float,
    scale_query: bool = False,
    window: int | None = None,
    group: int = 16,
    q_width: int | None = 8,
    p_width: int | None = 8,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple:
    """Fused cache-write + decode attention over the layer-stacked MXINT8
    cache: returns (attn (B, H, 1, d), k_codes, k_exps, v_codes, v_exps)
    with the cache arrays updated in place (aliased) — the serving scan's
    single attention+insert launch. Bitwise equal to
    `cache_write.write_kv_tokens_fused` followed by
    `decode_attention_quantized` (parity test in tests/test_serving.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, S, d = q.shape
    assert S == 1, S
    assert k_codes.ndim == 5, ("layer-stacked cache required", k_codes.shape)
    KVH, L = k_codes.shape[-3], k_codes.shape[-1]
    assert k_codes.shape[-2] == d
    n_rep = H // KVH
    assert d // k_exps.shape[-2] == group
    assert L % 128 == 0, ("aligned cache length required", L)
    kc = _kvh_chunk(KVH, L, d, 1 + 1 / group)
    G, Hq = KVH // kc, kc * n_rep
    LANEBLK = 128

    kernel = functools.partial(
        _kernel_quantized_write, scaling=scaling, scale_query=scale_query,
        window=window, group=group, n_rep=n_rep, cache_mb=7.0,
        q_mb=None if q_width is None else q_width - 1,
        p_mb=None if p_width is None else p_width - 1,
        dot_dtype=jnp.float32 if interpret else jnp.bfloat16,
    )

    spec_c = pl.BlockSpec((None, 1, kc, d, L),
                          lambda b, g, idx, pos: (idx[0], b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec((None, 1, kc, d // group, L),
                          lambda b, g, idx, pos: (idx[0], b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_new = pl.BlockSpec((1, kc, 1, d),
                            lambda b, g, idx, pos: (b, g, 0, 0),
                            memory_space=pltpu.VMEM)
    win_c = pl.BlockSpec(
        (None, 1, kc, d, LANEBLK),
        lambda b, g, idx, pos: (idx[0], b, g, 0, pos[b] // LANEBLK),
        memory_space=pltpu.VMEM)
    win_e = pl.BlockSpec(
        (None, 1, kc, d // group, LANEBLK),
        lambda b, g, idx, pos: (idx[0], b, g, 0, pos[b] // LANEBLK),
        memory_space=pltpu.VMEM)
    spec_q = pl.BlockSpec((1, Hq, 1, d),
                          lambda b, g, idx, pos: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, Hq, 1, d),
                            lambda b, g, idx, pos: (b, g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, G),
        in_specs=[spec_q, spec_c, spec_e, spec_c, spec_e, spec_new,
                  spec_new],
        out_specs=[out_spec, win_c, win_e, win_c, win_e],
    )
    # flat inputs: idx(0) pos(1) q(2) kc(3) ke(4) vc(5) ve(6) kh(7) vh(8);
    # outputs: attn(0) + the four aliased cache arrays
    aliases = {3: 1, 4: 2, 5: 3, 6: 4}
    out_shapes = [
        jax.ShapeDtypeStruct((B, H, 1, d), out_dtype),
        jax.ShapeDtypeStruct(k_codes.shape, k_codes.dtype),
        jax.ShapeDtypeStruct(k_exps.shape, k_exps.dtype),
        jax.ShapeDtypeStruct(v_codes.shape, v_codes.dtype),
        jax.ShapeDtypeStruct(v_exps.shape, v_exps.dtype),
    ]
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * d,
            bytes_accessed=2 * B * KVH * L * (d + d // group),
            transcendentals=B * H * L,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_index, jnp.int32).reshape(1),
        positions.astype(jnp.int32),
        q, k_codes, k_exps, v_codes, v_exps,
        kh.astype(jnp.float32), vh.astype(jnp.float32),
    )
    return tuple(res)
