"""Fused MXINT4 dequant-GEMM + rank-k LQER correction — the Pallas serving
kernel.

This is the real-kernel upgrade over the reference's software emulation
(SURVEY.md §0, BASELINE.json north star): every quantized linear executes

    ``Y = X_q · dequant(W4)^T  +  q_a(X_q · A) · B  (+ bias)``

as ONE kernel: 4-bit weights stream from HBM packed two-codes-per-byte with
one int8 shared exponent per 16-element group (format parity with the
reference's W4 `block_fp`, `block_fp.py:39-68`); the X tile loaded into VMEM
feeds both the main MXU dot and the rank-k correction dot, sharing the
activation HBM load (`quantized_layers/linear.py:145-157` is the emulated
math being reproduced).

Storage (round 3): weights are **tile-major co-packed** — one int8 array
``(K/tile_k, N/tile_n, S, tile_n)`` whose (k, n) slab holds the K-split
nibble-packed codes followed by the per-group exponents, so each grid step's
weight fetch is a single contiguous ~0.5 MB DMA (see
``storage.pack_w4_tiles``). The previous 2D layout made every tile fetch
``tile_k/2`` strided ``tile_n``-byte rows plus a second tiny exponent
stream, and measured ~3.5x below the XLA dense dot's streaming rate.

Numerics: X_q is pre-quantized MXINT8 dequantized to bf16 (exact — ≤8-bit
mantissa integers), W4 mantissas are exact in bf16, the MXU accumulates in
f32 ⇒ results match the fp32 fake-quant GEMM up to accumulation order.

Grid ``(M/TM, N/TN, K/TK)``, K innermost; the low-rank partial ``X·A`` is
accumulated in scratch during the ``n == 0`` sweep and reused for every
other N tile (grid iteration on a TPU core is sequential row-major).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..storage import MXINT4, MXFormat, pack_w4_tiles, pack_w8_tiles, quantize_mx
from ..quantizers import block_fp_quantizer


def _quantize_rows_mx(x: jnp.ndarray, mb: int, group: int = 16) -> jnp.ndarray:
    """In-kernel emulation of the A_out/B_out quantizer: per (row, group of
    ``group`` along last dim) shared-exponent quantize-dequantize
    (activation-format `block_fp`, width = mb+1, `linear.py:113-132`).
    A last dim not divisible by ``group`` (e.g. rank 8 < 16) falls back to a
    whole-row group, matching the reference's block-shape clamping for
    dims < block and approximating it for other non-multiples.

    Mosaic cannot reshape the lane (last) dim into groups ("unsupported
    shape cast"), so the grouping runs transposed: lanes → sublanes,
    sublane-split reshape (supported), reduce, transpose back."""
    m, n = x.shape
    if n % group != 0:
        group = n
    xt = x.T  # (n, m): groups now lie along sublanes
    v = xt.reshape(n // group, group, m)
    bmax = jnp.max(jnp.abs(v), axis=1, keepdims=True)
    nz_min = jnp.min(jnp.where(bmax != 0, bmax, jnp.inf))
    fill = jnp.where(jnp.isinf(nz_min), jnp.float32(1.0), nz_min)
    bmax = jnp.where(bmax == 0, fill, bmax)
    e = jnp.clip(jnp.ceil(jnp.log2(bmax)), -127.0, 128.0)
    scale = jnp.exp2(e)
    shift = float(2**mb)
    sign = jnp.sign(v + 1e-9)
    mant = jnp.clip(jnp.round((jnp.abs(v) + 1e-9) / scale * shift), 0, 2**mb - 1)
    q = sign * scale * (mant / shift)
    q = jnp.where(jnp.abs(v) <= 1e-8, v, q)
    return q.reshape(n, m).T


def _dot_w4(x, t_ref, mb: int, group: int, tile_k: int) -> jnp.ndarray:
    """``x @ dequant(W4_tile)`` from a co-packed tile ref: rows ``[0, TK/2)``
    hold the packed codes (low nibbles = first half of the K tile, high =
    second — the K-split layout), rows ``[TK/2, TK/2 + TK/group)`` the int8
    shared exponents. TWO half-K dots on the separately-scaled nibble planes
    skip the sublane concat a single full-K dot needs (~25% on decode
    shapes, experiments/bench_dequant_variants.py).

    ``mb > 3`` selects the DIRECT int8 layout (`storage.pack_w8_tiles` —
    width-8 weights, e.g. the packed lm_head): rows ``[0, TK)`` unpacked
    codes, then the exponents; one full-K dot."""
    if mb > 3:
        ge = tile_k // group
        c = t_ref[0:tile_k, :].astype(jnp.float32)
        e = t_ref[tile_k:tile_k + ge, :]
        scale = jnp.exp2(e.astype(jnp.float32) - mb)
        tn = c.shape[1]
        w = (c.reshape(ge, group, tn) * scale[:, None, :]
             ).reshape(tile_k, tn).astype(jnp.bfloat16)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)
    tk2 = tile_k // 2
    ge = tile_k // group
    p = t_ref[0:tk2, :].astype(jnp.int32)
    e = t_ref[tk2:tk2 + ge, :]
    low = (p << 28) >> 28
    high = (p << 24) >> 28
    scale = jnp.exp2(e.astype(jnp.float32) - mb)  # (TK/g, TN)
    tn = p.shape[1]
    hg = tk2 // group

    def scaled(codes, s):
        c = codes.astype(jnp.float32)
        return (c.reshape(hg, group, tn) * s[:, None, :]
                ).reshape(tk2, tn).astype(jnp.bfloat16)

    acc = jnp.dot(x[:, :tk2], scaled(low, scale[:hg]),
                  preferred_element_type=jnp.float32)
    return acc + jnp.dot(x[:, tk2:], scaled(high, scale[hg:]),
                         preferred_element_type=jnp.float32)


def _kernel(
    x_ref, t_ref, a_ref, b_ref, bias_ref, o_ref, acc, xa,
    xq_scr=None,
    *, mb: int, tile_k: int, group: int, rank: int, has_bias: bool,
    quant_xa_mb: int | None, quant_out_mb: int | None,
    quant_x_mb: int | None = None,
):
    n = pl.program_id(1)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    if quant_x_mb is not None:
        # in-kernel activation quantization (round-5 v2): x arrives RAW f32
        # as a FULL-K block (constant index over n/k) and quantizes ONCE per
        # m tile into scratch — bit-identical VALUES to the XLA x_quantizer
        # (16-group boundaries align; zero-group fills affect no value).
        # v1 quantized the (tile_m, tile_k) slice per grid step and LOST
        # ~150 us/layer to the repeated in-step transposed grouping.
        @pl.when((k == 0) & (n == 0))
        def _():
            # chunked: the transposed 16-grouping of a full-K row block
            # lane-pads its intermediates (a (K, m) f32 transpose costs
            # ~K*128*4 B of stack — 2 MB at K=4096, measured 3.7 MB over
            # the scoped budget); 512-lane chunks keep it bounded
            K_full = xq_scr.shape[1]
            for c0 in range(0, K_full, 512):
                ch = min(512, K_full - c0)
                xq_scr[:, c0:c0 + ch] = _quantize_rows_mx(
                    x_ref[:, c0:c0 + ch].astype(jnp.float32), quant_x_mb
                ).astype(xq_scr.dtype)

        x = xq_scr[:, pl.ds(k * tile_k, tile_k)]
    else:
        x = x_ref[:]
    acc[:] += _dot_w4(x, t_ref, mb, group, tile_k)

    # ---- rank-k partial: computed once per M tile (n == 0 sweep) ----
    # The tiny rank-k dots run with f32 operands: identical products (MXINT
    # values are exact in bf16 and f32) and portable to the CPU interpreter,
    # whose DotThunk lacks small bf16 dot support; cost is negligible vs the
    # main GEMM.
    if rank > 0:
        @pl.when(n == 0)
        def _():
            @pl.when(k == 0)
            def _():
                xa[:] = jnp.zeros_like(xa)

            xa[:] += jnp.dot(
                x.astype(jnp.float32), a_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )

    # ---- epilogue on the last K step ----
    @pl.when(k == nk - 1)
    def _():
        r = acc[:]
        if rank > 0:
            xa_val = xa[:]
            if quant_xa_mb is not None:
                xa_val = _quantize_rows_mx(xa_val, quant_xa_mb)
            corr = jnp.dot(
                xa_val.astype(jnp.bfloat16).astype(jnp.float32),
                b_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            if quant_out_mb is not None:
                corr = _quantize_rows_mx(corr, quant_out_mb)
            r = r + corr
        if has_bias:
            r = r + bias_ref[:].astype(jnp.float32)
        o_ref[:] = r.astype(o_ref.dtype)


def prepare_w4_weights(
    w: jnp.ndarray,
    a: jnp.ndarray | None = None,
    b: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    fmt: MXFormat = MXINT4,
    tile_k: int = 256,
    tile_n: int | None = None,
):
    """Offline prep: ``w (out, in)`` → packed serving params.

    Returns dict with ``tiles (K/tile_k, N/tile_n, S, tile_n) int8`` (the
    tile-major co-packed codes+exponents layout, K=in, N=out — the kernel
    computes X·W^T so weights are stored transposed), ``a (K, R) bf16``,
    ``b (R, N) bf16``, ``bias (1, N) f32``, plus the static tile geometry.
    """
    wt = jnp.asarray(w, jnp.float32).T  # (K, N)
    K, N = wt.shape
    assert K % tile_k == 0, (K, tile_k)
    if tile_n is None:
        tile_n = _default_tile_n(N)
    assert N % tile_n == 0, (N, tile_n)
    codes, exps = quantize_mx(wt, fmt)
    pack = pack_w4_tiles if fmt.width == 4 else pack_w8_tiles
    tiles = pack(codes, exps, tile_k, tile_n, fmt.group_size)
    out = {
        "tiles": tiles,
        "tile_k": tile_k,
        "tile_n": tile_n,
        "fmt": fmt,
        "a": None if a is None else jnp.asarray(a, jnp.bfloat16),
        "b": None if b is None else jnp.asarray(b, jnp.bfloat16),
        "bias": None if bias is None else jnp.asarray(bias, jnp.float32)[None, :],
    }
    return out


def _default_tile_n(n: int) -> int:
    for tn in (1024, 512, 256, 128):
        if n % tn == 0:
            return tn
    raise ValueError(f"out_features {n} not divisible by a supported tile")


@functools.partial(
    jax.jit,
    static_argnames=(
        "mb", "group", "tile_m", "tile_n", "tile_k", "rank",
        "quant_xa_mb", "quant_out_mb", "quant_x_mb", "out_dtype",
        "interpret",
    ),
)
def _fused_call(
    x_q, tiles, a, b, bias,
    *, mb, group, tile_m, tile_n, tile_k, rank,
    quant_xa_mb, quant_out_mb, out_dtype, interpret,
    quant_x_mb=None,
    layer_index=None,
):
    """``layer_index`` (a (1,) int32 array) selects the layer when the
    weight-side operands carry a leading L dim (tiles (L, nk, nn, S, tn),
    a (L, K, R), b (L, R, N), bias (L, 1, N)): the kernel indexes the
    stacked HBM arrays directly through a scalar-prefetch BlockSpec
    index_map. This is how the lax.scan serving paths must call the kernel —
    threading a per-layer slice through scan xs makes XLA MATERIALIZE a copy
    of the multi-MB slice every layer (pallas_call operands, unlike dot
    operands, cannot fuse a dynamic-slice), tripling weight HBM traffic
    (measured: ~3x fetch gap vs XLA's dense dot in the same window)."""
    M, K = x_q.shape
    indexed = layer_index is not None
    n_k, n_n, S, _ = tiles.shape[-4:]
    N = n_n * tile_n
    grid = (M // tile_m, n_n, n_k)

    def im(f):
        """index_map: with scalar prefetch the map receives a trailing
        scalar ref; weight-side maps prepend the layer index."""
        if not indexed:
            return f
        return lambda m, n, k, idx: f(m, n, k)

    def im_w(f):
        if not indexed:
            return f
        return lambda m, n, k, idx: (idx[0], *f(m, n, k))

    def wshape(shape):
        return (None, *shape) if indexed else shape

    in_specs = [
        (pl.BlockSpec((tile_m, K), im(lambda m, n, k: (m, 0)),
                      memory_space=pltpu.VMEM)
         if quant_x_mb is not None else
         pl.BlockSpec((tile_m, tile_k), im(lambda m, n, k: (m, k)),
                      memory_space=pltpu.VMEM)),
        pl.BlockSpec(wshape((None, None, S, tile_n)),
                     im_w(lambda m, n, k: (k, n, 0, 0)),
                     memory_space=pltpu.VMEM),
    ]
    args = [x_q.astype(jnp.float32 if quant_x_mb is not None
                       else jnp.bfloat16), tiles]
    if rank > 0:
        in_specs += [
            pl.BlockSpec(wshape((tile_k, rank)),
                         im_w(lambda m, n, k: (k, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wshape((rank, tile_n)),
                         im_w(lambda m, n, k: (0, n)),
                         memory_space=pltpu.VMEM),
        ]
        args += [a, b]
    has_bias = bias is not None
    if has_bias:
        in_specs.append(
            pl.BlockSpec(wshape((1, tile_n)),
                         im_w(lambda m, n, k: (0, n)),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)

    kernel = functools.partial(
        _kernel_variant(rank, has_bias, drop_scalar=indexed),
        mb=mb, tile_k=tile_k, group=group, rank=rank, has_bias=has_bias,
        quant_xa_mb=quant_xa_mb, quant_out_mb=quant_out_mb,
        quant_x_mb=quant_x_mb,
    )

    # m tiles are independent; n and k carry scratch state (xa, acc)
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        )
    except TypeError:  # older field layout
        compiler_params = None

    scratch_shapes = [
        pltpu.VMEM((tile_m, tile_n), jnp.float32),
        pltpu.VMEM((tile_m, max(rank, 8)), jnp.float32),
    ]
    if quant_x_mb is not None:
        scratch_shapes.append(pltpu.VMEM((tile_m, K), jnp.bfloat16))
    cost = pl.CostEstimate(
        flops=2 * M * N * K + (2 * M * K * rank + 2 * M * rank * N),
        bytes_accessed=M * K * 2 + n_k * n_n * S * tile_n + M * N * 2,
        transcendentals=0,
    )
    out_spec = pl.BlockSpec((tile_m, tile_n), im(lambda m, n, k: (m, n)),
                            memory_space=pltpu.VMEM)
    if indexed:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch_shapes,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            cost_estimate=cost,
            compiler_params=compiler_params,
            interpret=interpret,
        )(jnp.asarray(layer_index, jnp.int32).reshape(1), *args)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=cost,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*args)


def _kernel_variant(rank: int, has_bias: bool, drop_scalar: bool = False):
    """Adapter dropping absent refs from the kernel signature.
    ``drop_scalar``: a scalar-prefetch layer-index ref arrives first (its
    value is consumed by the BlockSpec index maps, not the kernel body)."""

    def k_fn(*refs, **kw):
        if drop_scalar:
            refs = refs[1:]
        # refs layout: x, tiles, [a, b], [bias], o, acc, xa, [xq_scr]
        idx = 2
        a_ref = b_ref = bias_ref = None
        refs = list(refs)
        if rank > 0:
            a_ref, b_ref = refs[idx], refs[idx + 1]
            idx += 2
        if has_bias:
            bias_ref = refs[idx]
            idx += 1
        o_ref, acc, xa = refs[idx], refs[idx + 1], refs[idx + 2]
        xq_scr = refs[idx + 3] if len(refs) > idx + 3 else None
        return _kernel(
            refs[0], refs[1], a_ref, b_ref, bias_ref, o_ref, acc, xa,
            xq_scr,
            **kw,
        )

    return k_fn


def _unpack_kernel(*refs, mb: int, group: int, tile_k: int,
                   drop_scalar: bool):
    """One (k, n[, lane-sub]) tile: co-packed slab slice -> dequantized
    bf16 block (lane sub-tiling keeps the f32 unpack temps inside the
    16 MB scoped VMEM for 2048-row K tiles)."""
    if drop_scalar:
        refs = refs[1:]
    t_ref, o_ref = refs
    ge = tile_k // group
    if mb > 3:
        c = t_ref[0:tile_k, :].astype(jnp.float32)
        e = t_ref[tile_k:tile_k + ge, :]
        scale = jnp.exp2(e.astype(jnp.float32) - mb)
        tn = c.shape[1]
        w = (c.reshape(ge, group, tn) * scale[:, None, :]
             ).reshape(tile_k, tn)
    else:
        tk2 = tile_k // 2
        p = t_ref[0:tk2, :].astype(jnp.int32)
        e = t_ref[tk2:tk2 + ge, :]
        low = (p << 28) >> 28
        high = (p << 24) >> 28
        scale = jnp.exp2(e.astype(jnp.float32) - mb)
        tn = p.shape[1]
        hg = tk2 // group

        def scaled(codes, s):
            return (codes.astype(jnp.float32).reshape(hg, group, tn)
                    * s[:, None, :]).reshape(tk2, tn)

        w = jnp.concatenate([scaled(low, scale[:hg]),
                             scaled(high, scale[hg:])], axis=0)
    o_ref[...] = w.astype(o_ref.dtype)


def _unpack_tiles_pallas(tiles, tile_k, tile_n, fmt, layer_index,
                         interpret):
    """Pallas dequant pass: tile slab in, bf16 (tile_k, tile_n) block out.
    The jnp unpack's (nk, nn, tile_k, tn)->(K, N) transpose materializes a
    full-weight-size relayout copy that measured ~8 ms/layer at 7B prefill;
    this kernel writes each block straight to its (k, n) home."""
    indexed = layer_index is not None
    nk, nn, S, tn = tiles.shape[-4:]  # noqa: F841 (S used via in_spec)
    K, N = nk * tile_k, nn * tile_n
    # lane sub-tiling: the per-step f32 unpack temps are ~tile_k*sub_n*6 B;
    # keep them under ~3 MB (2048-row tiles overflowed the scoped VMEM by
    # 2.7 MB with whole-tn blocks)
    sub_n = tn
    while tile_k * sub_n * 6 > 3 * 1024 * 1024 and sub_n % 2 == 0             and sub_n > 128:
        sub_n //= 2
    n_sub = tn // sub_n

    def im_t(k, n, j, *idx):
        return (idx[0][0], k, n, 0, j) if indexed else (k, n, 0, j)

    def im_o(k, n, j, *idx):
        return (k, n * n_sub + j)

    in_spec = pl.BlockSpec(
        ((None,) if indexed else ()) + (None, None, S, sub_n), im_t,
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_k, sub_n), im_o,
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _unpack_kernel, mb=fmt.mantissa_bits, group=fmt.group_size,
        tile_k=tile_k, drop_scalar=indexed)
    if indexed:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nk, nn, n_sub),
            in_specs=[in_spec], out_specs=out_spec)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16),
            interpret=interpret,
        )(jnp.asarray(layer_index, jnp.int32).reshape(1), tiles)
    return pl.pallas_call(
        kernel, grid=(nk, nn, n_sub), in_specs=[in_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16),
        interpret=interpret,
    )(tiles)


def unpack_tiles_to_bf16(tiles: jnp.ndarray, tile_k: int, tile_n: int,
                         fmt: MXFormat, layer_index=None,
                         use_pallas: bool | None = None) -> jnp.ndarray:
    """Dequantize tile-major co-packed weights back to a dense bf16 (K, N)
    matrix IN HBM (one XLA pass). Large-M path (prefill/eval): the decode
    kernel's grid refetches and re-dequantizes every weight tile once per
    128-row M tile — at a 2048-token prefill that is 16 redundant passes
    over the full weight stream; dequantizing ONCE and letting XLA's dense
    dot run the MXU at its own streaming rate (~744 GB/s measured) is
    strictly better past a few hundred rows. Bit-identical to the kernel's
    in-VMEM dequant (`_dot_w4`) by construction: same codes, same
    ``2^(e - mb)`` scales, same bf16 rounding.

    On TPU the unpack runs as a Pallas pass (`_unpack_tiles_pallas` — the
    jnp path's final transpose materializes a full-weight relayout copy);
    ``use_pallas=False`` forces the jnp reference (tests)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _unpack_tiles_pallas(tiles, tile_k, tile_n, fmt,
                                    layer_index, interpret=False)
    if layer_index is not None:
        tiles = tiles[jnp.asarray(layer_index, jnp.int32).reshape(())]
    nk, nn, S, tn = tiles.shape
    assert tn == tile_n, (tn, tile_n)
    ge = tile_k // fmt.group_size
    mb = fmt.mantissa_bits
    if fmt.width == 4:
        half = tile_k // 2
        p = tiles[:, :, :half, :].astype(jnp.int32)
        e = tiles[:, :, half:half + ge, :]
        low = (p << 28) >> 28
        high = (p << 24) >> 28
        codes = jnp.concatenate([low, high], axis=2)   # (nk, nn, tile_k, tn)
    else:
        codes = tiles[:, :, :tile_k, :].astype(jnp.int32)
        e = tiles[:, :, tile_k:tile_k + ge, :]
    scale = jnp.exp2(e.astype(jnp.float32) - mb)       # (nk, nn, ge, tn)
    w = (codes.astype(jnp.float32)
         .reshape(nk, nn, ge, fmt.group_size, tn) * scale[:, :, :, None, :]
         ).astype(jnp.bfloat16)
    # (nk, nn, ge, g, tn) -> (K, N)
    return w.reshape(nk, nn, tile_k, tn).transpose(0, 2, 1, 3) \
        .reshape(nk * tile_k, nn * tn)


def qlinear_w4_dense_largeM(
    x_q: jnp.ndarray,  # (M, K) activation-quantized (exact in bf16)
    prep: dict,
    *,
    quant_xa_width: int | None = 8,
    quant_out_width: int | None = 8,
    out_dtype=jnp.float32,
    layer_index=None,
) -> jnp.ndarray:
    """Large-M (prefill/eval) path: dequantize the packed weights once to
    HBM bf16 and run XLA dense dots — same math as the fused kernel
    (`_dot_w4` weights, `_quantize_rows_mx` partial quantizers) up to f32
    accumulation order."""
    fmt: MXFormat = prep["fmt"]
    w = unpack_tiles_to_bf16(prep["tiles"], prep["tile_k"], prep["tile_n"],
                             fmt, layer_index=layer_index)
    xb = x_q.astype(jnp.bfloat16)
    y = jnp.dot(xb, w, preferred_element_type=jnp.float32)
    a, b = prep.get("a"), prep.get("b")
    if layer_index is not None:
        layer_index = jnp.asarray(layer_index, jnp.int32).reshape(())
    if a is not None:
        if layer_index is not None:
            a = a[layer_index]
            b = b[layer_index]
        xa = jnp.dot(xb.astype(jnp.float32), a.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        if quant_xa_width is not None:
            xa = _quantize_rows_mx(xa, quant_xa_width - 1)
        corr = jnp.dot(xa.astype(jnp.bfloat16).astype(jnp.float32),
                       b.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        if quant_out_width is not None:
            corr = _quantize_rows_mx(corr, quant_out_width - 1)
        y = y + corr
    bias = prep.get("bias")
    if bias is not None:
        if layer_index is not None:
            bias = bias[layer_index]
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def qlinear_w4_fused(
    x_q: jnp.ndarray,
    prep: dict,
    *,
    tile_m: int = 128,
    tile_n: int | None = None,
    quant_xa_width: int | None = 8,
    quant_out_width: int | None = 8,
    quant_x_width: int | None = None,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
    layer_index=None,
) -> jnp.ndarray:
    """Run the fused kernel. ``x_q (M, K)`` should already be
    activation-quantized (MXINT8 dequantized values, exact in bf16);
    ``prep`` comes from :func:`prepare_w4_weights`.

    ``tile_n`` is baked into the prep's tile-major storage; the kwarg is
    accepted for interface stability and must match when given.
    ``quant_xa_width``/``quant_out_width`` emulate the reference's
    A_out/B_out quantizers on the low-rank partials (None disables).
    ``interpret=None`` auto-selects interpreter mode off-TPU.
    ``layer_index``: scalar int32 selecting the layer when ``prep`` holds
    LAYER-STACKED operands (leading L dim on tiles/a/b/bias) — required
    inside lax.scan bodies so the kernel reads the stacked HBM arrays in
    place instead of a per-layer slice copy (see ``_fused_call``).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fmt: MXFormat = prep["fmt"]
    M, K = x_q.shape
    if tile_n is not None and tile_n != prep["tile_n"]:
        raise ValueError(
            f"tile_n={tile_n} differs from the prep's tile-major layout "
            f"({prep['tile_n']}); re-pack with prepare_w4_weights(tile_n=...)"
        )
    tn = prep["tile_n"]
    a, b = prep["a"], prep["b"]
    rank = 0 if a is None else a.shape[-1]
    tile_k = prep["tile_k"]

    tm = min(tile_m, M) if M >= 8 else 8
    if M % tm != 0 or M < 8:
        pad = -M % tm if M >= 8 else 8 - M
        x_q = jnp.pad(x_q, ((0, pad), (0, 0)))
    assert K % tile_k == 0
    if layer_index is not None:
        assert prep["tiles"].ndim == 5, (
            "layer_index needs layer-stacked prep arrays (leading L dim)"
        )

    out = _fused_call(
        x_q, prep["tiles"], a, b, prep["bias"],
        mb=fmt.mantissa_bits, group=fmt.group_size,
        tile_m=tm, tile_n=tn, tile_k=tile_k, rank=rank,
        quant_xa_mb=None if quant_xa_width is None else quant_xa_width - 1,
        quant_out_mb=None if quant_out_width is None else quant_out_width - 1,
        quant_x_mb=None if quant_x_width is None else quant_x_width - 1,
        out_dtype=out_dtype, interpret=interpret, layer_index=layer_index,
    )
    return out[:M]


def qlinear_w4_fused_emulation(
    x_q: jnp.ndarray,
    w: jnp.ndarray,
    a: jnp.ndarray | None,
    b: jnp.ndarray | None,
    bias: jnp.ndarray | None,
    quant_xa_width: int | None = 8,
    quant_out_width: int | None = 8,
) -> jnp.ndarray:
    """jnp reference of the kernel math (for allclose tests): W4 quantize via
    the bit-exact `block_fp_quantizer`, bf16 operands, f32 accumulation."""
    w_q = block_fp_quantizer(
        w.astype(jnp.float32), width=4, exponent_width=8, exponent_bias=None,
        block_size=[1, 16], skip_first_dim=False,
    )
    y = jnp.dot(
        x_q.astype(jnp.bfloat16), w_q.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if a is not None:
        xa = jnp.dot(
            x_q.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        if quant_xa_width is not None:
            xa = _quantize_rows_mx(xa, quant_xa_width - 1)
        corr = jnp.dot(
            xa.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        if quant_out_width is not None:
            corr = _quantize_rows_mx(corr, quant_out_width - 1)
        y = y + corr
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y
