#!/usr/bin/env python
"""Probe the fused dequant-GEMM's bottleneck on the real TPU.

Methodology (matches bench.py): L stacked layers scanned inside ONE jit so a
whole multi-layer step is a single dispatch (the remote relay both overlaps
independent dispatches across backend resources and adds large per-hop
latency to chained dispatches — scan sidesteps both), chained iterations,
and the per-iteration time taken as the marginal between a short and a long
chain.

Variants of the W4 dequant pipeline inside the kernel:
  full        — shifts -> concat -> f32 -> scale-mul -> bf16 -> dot (today)
  f32dot      — skip the final bf16 cast; dot in f32 (identical products
                for MXINT grids)
  twodot      — no concat: two half-K dots on the separately-scaled nibble
                planes
  twodot_bf16 — twodot with bf16 x and bf16 dequant multiply
  twodot_bf16mul — twodot with f32 convert but bf16 scale-multiply
  stream      — fetch-only lower bound (reduce the packed tile, no dequant)
  i8shift     — int8-native nibble shifts (no int32 expansion)
  bittrick    — biased-exponent-bitcast bf16 scale + direct bf16 codes-cast
                and multiply (minimal VPU op count; int32 nibble extraction
                — Mosaic only lowers vector shifts on i32)
  bt_i32      — alias of bittrick (kept for sweep-script compat)
  ab_convonly / ab_noscale / ab_noshift — ablations dropping one dequant
                stage at a time (scale-mul / shift) to price each stage
  wide        — full-N contiguous slab tiles (tile_n = N)
  pack32      — int32-word-packed codes (8 nibbles/word; Mosaic gather bug)
  intdot      — int8 group dots, scale applied to int32 partials
  dense16     — XLA bf16 dot streaming real (K,N) bf16 weights (2x HBM bytes)
  xla         — no pallas: jnp unpack+scale+dot, XLA-fused
"""

import argparse
import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE = str(Path(__file__).resolve().parents[1] / ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from lqer_tpu.ops.storage import MXINT4, pack_int4_ksplit, quantize_mx  # noqa: E402


def _kernel(x_ref, p_ref, e_ref, o_ref, acc, *, variant, group, mb):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    if variant == "stream":
        # pure HBM streaming probe: the BlockSpecs still fetch every packed
        # tile into VMEM; compute is negligible. Measures the Pallas grid
        # pipeline's achievable read bandwidth, isolating it from dequant
        # VPU work and the MXU dot.
        m_rows = acc.shape[0]
        acc[:] += (p_ref[:m_rows, :acc.shape[1]].astype(jnp.float32)
                   + e_ref[:1, :acc.shape[1]].astype(jnp.float32))

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

        return
    if variant in ("bittrick", "bt_i32", "bt_f32acc"):
        # Minimal-VPU dequant: scale built by writing the biased exponent
        # straight into the bf16 exponent field (integer add + *128 +
        # bitcast — no exp2 transcendental, no f32 multiply), codes cast
        # DIRECTLY to bf16 and multiplied by the bf16 power-of-two scale
        # (exact: 3-bit mantissas x powers of two).
        # Mosaic only lowers vector shifts on int32 (i8/i16 arith.shli fails
        # to legalize — measured), so extraction is int32-domain and the
        # static <<7 becomes a *128 multiply narrowed to int16 for bitcast.
        p = p_ref[:].astype(jnp.int32)
        low = (p << 28) >> 28
        high = (p << 24) >> 28
        if variant == "bt_f32acc":
            low, high = low.astype(jnp.int8), high.astype(jnp.int8)
        eb = ((e_ref[:].astype(jnp.int32) + (127 - mb)) * 128
              ).astype(jnp.int16)
        scale = jax.lax.bitcast_convert_type(eb, jnp.bfloat16)
        tk2, tn = low.shape
        hg = tk2 // group
        x = x_ref[:]

        def scaled(codes, s):
            c = codes.astype(jnp.bfloat16)
            return (c.reshape(hg, group, tn) * s[:, None, :]
                    ).reshape(tk2, tn)

        acc[:] += jnp.dot(x[:, :tk2], scaled(low, scale[:hg]),
                          preferred_element_type=jnp.float32)
        acc[:] += jnp.dot(x[:, tk2:], scaled(high, scale[hg:]),
                          preferred_element_type=jnp.float32)

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

        return
    if variant == "i8shift":
        # nibble shifts on int8 vectors (4 codes/lane) instead of int32
        p8 = p_ref[:]
        low = (p8 << 4) >> 4
        high = p8 >> 4
        variant = "twodot_bf16"
    else:
        p = p_ref[:].astype(jnp.int32)
        low = (p << 28) >> 28
        high = (p << 24) >> 28
    scale = jnp.exp2(e_ref[:].astype(jnp.float32) - mb)  # (TK/g, TN)

    if variant in ("ab_convonly", "ab_noscale", "ab_noshift"):
        # ---- VPU ablations (wrong numerics, timing only) ----
        # Same HBM bytes and the same two half-K dots as `twodot`; each drops
        # part of the dequant chain to attribute its VPU cost:
        #   ab_convonly — int8 -> bf16 convert only (no shifts, no scale)
        #   ab_noscale  — shifts + f32 convert + bf16 cast (no scale mul)
        #   ab_noshift  — f32 convert + group-scale mul + bf16 cast (no shifts)
        p8 = p_ref[:]
        tk2, tn = p8.shape
        hg = tk2 // group
        x = x_ref[:]
        if variant == "ab_convonly":
            w_lo = p8.astype(jnp.bfloat16)
            w_hi = (p8 + 1).astype(jnp.bfloat16)
        elif variant == "ab_noscale":
            p = p8.astype(jnp.int32)
            w_lo = ((p << 28) >> 28).astype(jnp.float32).astype(jnp.bfloat16)
            w_hi = ((p << 24) >> 28).astype(jnp.float32).astype(jnp.bfloat16)
        else:  # ab_noshift
            def scaled(codes, s):
                c = codes.astype(jnp.float32)
                return (c.reshape(hg, group, tn) * s[:, None, :]
                        ).reshape(tk2, tn).astype(jnp.bfloat16)

            w_lo = scaled(p8, scale[:hg])
            w_hi = scaled(p8 + 1, scale[hg:])
        acc[:] += jnp.dot(x[:, :tk2], w_lo, preferred_element_type=jnp.float32)
        acc[:] += jnp.dot(x[:, tk2:], w_hi, preferred_element_type=jnp.float32)

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

        return
    if variant in ("twodot", "twodot_bf16", "twodot_bf16mul"):
        tk2, tn = low.shape
        half_g = tk2 // group

        if variant == "twodot_bf16mul":
            # cast codes straight to bf16 and multiply by bf16 scales:
            # 4-bit codes x power-of-2 scales are exact in bf16
            x = x_ref[:]
            sc16 = scale.astype(jnp.bfloat16)

            def scaled(codes, s):
                c = codes.astype(jnp.bfloat16)
                return (c.reshape(half_g, group, tn) * s[:, None, :]
                        ).reshape(tk2, tn)

            w_lo = scaled(low, sc16[:half_g])
            w_hi = scaled(high, sc16[half_g:])
        else:
            x = x_ref[:] if variant == "twodot_bf16" else \
                x_ref[:].astype(jnp.float32)

            def scaled(codes, s):
                c = codes.astype(jnp.float32)
                w = (c.reshape(half_g, group, tn) * s[:, None, :]
                     ).reshape(tk2, tn)
                return w.astype(jnp.bfloat16) if variant == "twodot_bf16" else w

            w_lo = scaled(low, scale[:half_g])
            w_hi = scaled(high, scale[half_g:])
        acc[:] += jnp.dot(x[:, :tk2], w_lo, preferred_element_type=jnp.float32)
        acc[:] += jnp.dot(x[:, tk2:], w_hi, preferred_element_type=jnp.float32)
    else:
        codes = jnp.concatenate([low, high], axis=0).astype(jnp.float32)
        tk, tn = codes.shape
        w = (codes.reshape(tk // group, group, tn) * scale[:, None, :]
             ).reshape(tk, tn)
        if variant == "full":
            w = w.astype(jnp.bfloat16)
            x = x_ref[:]
        else:  # f32dot
            x = x_ref[:].astype(jnp.float32)
        acc[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def make_pallas_step(variant, L, M, N, K, tile_n, tile_k, group=16, mb=3):
    kern = functools.partial(_kernel, variant=variant, group=group, mb=mb)
    grid = (1, N // tile_n, K // tile_k)

    def one(x, packed, exps):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((max(M, 8), tile_k), lambda m, n, k: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k // 2, tile_n), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k // group, tile_n), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((max(M, 8), tile_n),
                                   lambda m, n, k: (m, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((max(M, 8), N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((max(M, 8), tile_n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(x, packed, exps)

    EPS = jnp.bfloat16(1e-4)

    @jax.jit
    def step(x, packed_l, exps_l):
        def body(x, sl):
            y = one(x, sl[0], sl[1])
            return x + y[:, :K] * EPS, None

        x, _ = jax.lax.scan(body, x, (packed_l, exps_l))
        return x

    return step


def _wide_kernel(x_ref, p_ref, e_ref, o_ref, acc, *, group, mb, n_chunk):
    """Full-width fetch: the packed block spans ALL of N, so every HBM read
    is one contiguous slab (the (tk/2, 1024) tiles of the standard layout
    read 1 KB bursts with an 11 KB stride — measured ~285 GB/s pure-stream
    vs ~536 GB/s for XLA's dense dot in the same window). Dequant+dot then
    walk N in chunks to keep the f32 intermediate small."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:]
    tk2, n_total = p_ref.shape
    hg = tk2 // group
    for c in range(n_total // n_chunk):
        sl = pl.ds(c * n_chunk, n_chunk)
        p = p_ref[:, sl].astype(jnp.int32)
        low = (p << 28) >> 28
        high = (p << 24) >> 28
        scale = jnp.exp2(e_ref[:, sl].astype(jnp.float32) - mb)

        def scaled(codes, s):
            cc = codes.astype(jnp.float32)
            return (cc.reshape(hg, group, n_chunk) * s[:, None, :]
                    ).reshape(tk2, n_chunk).astype(jnp.bfloat16)

        acc[:, sl] += jnp.dot(x[:, :tk2], scaled(low, scale[:hg]),
                              preferred_element_type=jnp.float32)
        acc[:, sl] += jnp.dot(x[:, tk2:], scaled(high, scale[hg:]),
                              preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def make_wide_step(L, M, N, K, tile_k, group=16, mb=3, n_chunk=1024):
    kern = functools.partial(_wide_kernel, group=group, mb=mb, n_chunk=n_chunk)
    grid = (1, K // tile_k)

    def one(x, packed, exps):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((max(M, 8), tile_k), lambda m, k: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k // 2, N), lambda m, k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k // group, N), lambda m, k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((max(M, 8), N), lambda m, k: (m, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((max(M, 8), N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((max(M, 8), N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, packed, exps)

    EPS = jnp.bfloat16(1e-4)

    @jax.jit
    def step(x, packed_l, exps_l):
        def body(x, sl):
            y = one(x, sl[0], sl[1])
            return x + y[:, :K] * EPS, None

        x, _ = jax.lax.scan(body, x, (packed_l, exps_l))
        return x

    return step


def pack_int4_k8(codes, tile_k):
    """(K, N) int4 codes → (K/8, N) int32: within each K-tile, word row j
    packs codes {j + s·tile_k/8, s=0..7}, nibble s. Unpack = 8 sign-extend
    shifts per word; the 8 K-slices dot separately (no concat, no int8
    VMEM). STATUS: the pack32 kernel currently fails Mosaic lowering
    ("Shape mismatch in input, indices and output" from a gather rule) —
    kept as a documented experiment; the production layout remains
    pack_int4_ksplit."""
    import numpy as np_

    K, N = codes.shape
    c = np_.asarray(codes, np_.int64) & 0xF
    t = c.reshape(K // tile_k, 8, tile_k // 8, N)
    word = np_.zeros((K // tile_k, tile_k // 8, N), np_.uint32)
    for s in range(8):
        word |= (t[:, s].astype(np_.uint32) << np_.uint32(4 * s))
    return jnp.asarray(word.reshape(K // 8, N).view(np_.int32))


def _pack32_kernel(x_ref, p_ref, e_ref, o_ref, acc, *, group, mb):
    """int32-word packed dequant: 8 K-slices, each extracted with two shifts
    from the SAME resident int32 block (no int8-typed VMEM, no concat)."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:]
    p = p_ref[:]                                    # (TK/8, TN) int32
    tk8, tn = p.shape
    sg = tk8 // group                               # groups per slice
    scale = jnp.exp2(e_ref[:].astype(jnp.float32) - mb)  # (TK/g, TN)
    for s in range(8):
        c = (p << (28 - 4 * s)) >> 28               # codes of slice s
        w = (c.astype(jnp.float32).reshape(sg, group, tn)
             * scale[s * sg:(s + 1) * sg, None, :]
             ).reshape(tk8, tn).astype(jnp.bfloat16)
        acc[:] += jnp.dot(x[:, s * tk8:(s + 1) * tk8], w,
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def make_pack32_step(L, M, N, K, tile_n, tile_k, group=16, mb=3):
    kern = functools.partial(_pack32_kernel, group=group, mb=mb)
    grid = (1, N // tile_n, K // tile_k)

    def one(x, packed, exps):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((max(M, 8), tile_k), lambda m, n, k: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k // 8, tile_n), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k // group, tile_n), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((max(M, 8), tile_n),
                                   lambda m, n, k: (m, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((max(M, 8), N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((max(M, 8), tile_n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(x, packed, exps)

    EPS = jnp.bfloat16(1e-4)

    @jax.jit
    def step(x, packed_l, exps_l):
        def body(x, sl):
            y = one(x, sl[0], sl[1])
            return x + y[:, :K] * EPS, None

        x, _ = jax.lax.scan(body, x, (packed_l, exps_l))
        return x

    return step


def _intdot_kernel(xc_ref, xe_ref, p_ref, e_ref, o_ref, acc,
                   *, group, mb, xmb):
    """int8 MXU path: batched per-group int8 dots, scales applied to the
    (G, M, TN) group partials in the epilogue — removes the O(K·N) float
    dequant entirely (replaced by O(K·N/16·M) epilogue work)."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p8 = p_ref[:]
    low = (p8 << 4) >> 4
    high = p8 >> 4
    wc = jnp.concatenate([low, high], axis=0)       # (TK, TN) int8
    tk, tn = wc.shape
    g = tk // group
    wg = wc.reshape(g, group, tn)

    xc = xc_ref[:]                                   # (M, TK) int8
    m = xc.shape[0]
    xg = xc.T.reshape(g, group, m)                   # (G, 16, M)

    part = jax.lax.dot_general(
        xg, wg, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )                                                # (G, M, TN) int32
    swf = jnp.exp2(e_ref[:].astype(jnp.float32) - mb)        # (G, TN)
    sxf = jnp.exp2(xe_ref[:].astype(jnp.float32) - xmb)      # (M, G)
    pf = part.astype(jnp.float32) * swf[:, None, :]
    pf = pf * sxf.T[:, :, None]
    acc[:] += jnp.sum(pf, axis=0)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def make_intdot_step(L, M, N, K, tile_n, tile_k, group=16, mb=3, xmb=7):
    kern = functools.partial(_intdot_kernel, group=group, mb=mb, xmb=xmb)
    grid = (1, N // tile_n, K // tile_k)

    def one(xc, xe, packed, exps):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((max(M, 8), tile_k), lambda m, n, k: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((max(M, 8), tile_k // group),
                             lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k // 2, tile_n), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k // group, tile_n), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((max(M, 8), tile_n),
                                   lambda m, n, k: (m, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((max(M, 8), N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((max(M, 8), tile_n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(xc, xe, packed, exps)

    @jax.jit
    def step(xc, xe, packed_l, exps_l):
        def body(xc, sl):
            y = one(xc, xe, sl[0], sl[1])
            # data-dependent no-op feedback so the chain cannot be elided
            xc = xc + (y[:, :K] * jnp.bfloat16(1e-30)).astype(jnp.int8)
            return xc, None

        xc, _ = jax.lax.scan(body, xc, (packed_l, exps_l))
        return xc

    return step


def _copacked_kernel(x_ref, t_ref, o_ref, acc, *, variant, group, mb,
                     tile_k):
    """Variants over the PRODUCTION tile-major co-packed storage
    (`storage.pack_w4_tiles`): one contiguous slab per (k, n) grid step.
      cstream   — fetch-only
      ctwodot   — production `_dot_w4` math (int32 shifts, exp2+f32 scale)
      cbittrick — biased-exponent bitcast + direct bf16 multiply
    """
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    tk2 = tile_k // 2
    ge = tile_k // group
    if variant == "cstream":
        m_rows, n_cols = acc.shape
        v = pltpu.bitcast(t_ref[:, :], jnp.int32)
        acc[:] += jnp.max(v).astype(jnp.float32)

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

        return
    x = x_ref[:]
    p = t_ref[0:tk2, :].astype(jnp.int32)
    e = t_ref[tk2:tk2 + ge, :]
    low = (p << 28) >> 28
    high = (p << 24) >> 28
    tn = p.shape[1]
    hg = tk2 // group
    if variant == "cbittrick":
        eb = ((e.astype(jnp.int32) + (127 - mb)) * 128).astype(jnp.int16)
        scale = jax.lax.bitcast_convert_type(eb, jnp.bfloat16)

        def scaled(codes, s):
            c = codes.astype(jnp.bfloat16)
            return (c.reshape(hg, group, tn) * s[:, None, :]
                    ).reshape(tk2, tn)
    elif variant == "cbf16mul":
        # bf16-domain dequant WITHOUT bitcasts: small exp2 in f32, one
        # astype to bf16 on the small plane, codes astype straight to bf16
        # — halves the VPU bytes of the multiply vs the f32 intermediate
        scale = jnp.exp2(e.astype(jnp.float32) - mb).astype(jnp.bfloat16)

        def scaled(codes, s):
            c = codes.astype(jnp.bfloat16)
            return (c.reshape(hg, group, tn) * s[:, None, :]
                    ).reshape(tk2, tn)
    else:  # ctwodot — production math
        scale = jnp.exp2(e.astype(jnp.float32) - mb)

        def scaled(codes, s):
            c = codes.astype(jnp.float32)
            return (c.reshape(hg, group, tn) * s[:, None, :]
                    ).reshape(tk2, tn).astype(jnp.bfloat16)

    acc[:] += jnp.dot(x[:, :tk2], scaled(low, scale[:hg]),
                      preferred_element_type=jnp.float32)
    acc[:] += jnp.dot(x[:, tk2:], scaled(high, scale[hg:]),
                      preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def _mdma_kernel(x_ref, t_hbm, o_ref, acc, bufs, sems, *, variant, group,
                 mb, tile_k, n_k, nbuf):
    """Manual multi-buffered DMA over the co-packed tiles: grid walks N
    only; the K loop runs in-kernel with ``nbuf`` outstanding HBM→VMEM
    copies (the grid pipeline double-buffers at most, serializing DMA issue
    latency with ~0.5 MB transfers — measured ~220 GB/s vs XLA's ~508).

      mstream — fetch-only (probes the deep-buffer fetch ceiling)
      mdma    — fetch + production twodot dequant+dots
    """
    n = pl.program_id(1)

    def dma(k):
        return pltpu.make_async_copy(
            t_hbm.at[k, n], bufs.at[k % nbuf], sems.at[k % nbuf])

    for k in range(min(nbuf - 1, n_k)):
        dma(k).start()

    acc[:] = jnp.zeros_like(acc)
    tk2 = tile_k // 2
    ge = tile_k // group
    hg = tk2 // group

    for k in range(n_k):  # static unroll: n_k is small (K/tile_k)
        if k + nbuf - 1 < n_k:
            dma(k + nbuf - 1).start()
        dma(k).wait()
        t = bufs[k % nbuf]
        if variant == "mstream":
            acc[:] += jnp.max(pltpu.bitcast(t, jnp.int32)
                              ).astype(jnp.float32)
            continue
        x = x_ref[:, k * tile_k:(k + 1) * tile_k]
        p = t[0:tk2, :].astype(jnp.int32)
        e = t[tk2:tk2 + ge, :]
        low = (p << 28) >> 28
        high = (p << 24) >> 28
        scale = jnp.exp2(e.astype(jnp.float32) - mb)
        tn = p.shape[1]

        def scaled(codes, s):
            c = codes.astype(jnp.float32)
            return (c.reshape(hg, group, tn) * s[:, None, :]
                    ).reshape(tk2, tn).astype(jnp.bfloat16)

        acc[:] += jnp.dot(x[:, :tk2], scaled(low, scale[:hg]),
                          preferred_element_type=jnp.float32)
        acc[:] += jnp.dot(x[:, tk2:], scaled(high, scale[hg:]),
                          preferred_element_type=jnp.float32)

    o_ref[:] = acc[:].astype(o_ref.dtype)


def make_mdma_step(variant, L, M, N, K, tile_n, tile_k, group=16, mb=3,
                   nbuf=4):
    n_k = K // tile_k
    S = tile_k // 2 + tile_k // group
    S += -S % 32
    kern = functools.partial(_mdma_kernel, variant=variant, group=group,
                             mb=mb, tile_k=tile_k, n_k=n_k, nbuf=nbuf)
    grid = (1, N // tile_n)

    def one(x, tiles):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((max(M, 8), K), lambda m, n: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM
            ],
            out_specs=pl.BlockSpec((max(M, 8), tile_n),
                                   lambda m, n: (m, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((max(M, 8), N), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((max(M, 8), tile_n), jnp.float32),
                pltpu.VMEM((nbuf, S, tile_n), jnp.int8),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, tiles)

    EPS = jnp.bfloat16(1e-4)

    @jax.jit
    def step(x, tiles_l):
        def body(x, t):
            y = one(x, t)
            return x + y[:, :K] * EPS, None

        x, _ = jax.lax.scan(body, x, tiles_l)
        return x

    return step


def make_cidx_step(variant, L, M, N, K, tile_n, tile_k, group=16, mb=3):
    """Scalar-prefetch layer indexing: the kernel sees the WHOLE stacked
    (L, n_k, n_n, S, tile_n) tiles array and its BlockSpec index_map picks
    the layer from a prefetched scalar — the scan carries only the layer
    index, so XLA never materializes a per-layer copy of the weight slice
    (the hypothesis for the ~3x fetch gap: pallas_call operands cannot fuse
    a dynamic-slice the way jnp.dot's HLO operand does)."""
    n_k = K // tile_k
    S = tile_k // 2 + tile_k // group
    S += -S % 32
    base = {"cistream": "cstream", "citwodot": "ctwodot",
            "cibf16mul": "cbf16mul"}[variant]
    kern0 = functools.partial(_copacked_kernel, variant=base, group=group,
                              mb=mb, tile_k=tile_k)

    def kern(idx_ref, x_ref, t_ref, o_ref, acc):
        del idx_ref
        return kern0(x_ref, t_ref, o_ref, acc)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, N // tile_n, n_k),
        in_specs=[
            pl.BlockSpec((max(M, 8), tile_k),
                         lambda m, n, k, idx: (m, k)),
            pl.BlockSpec((None, None, None, S, tile_n),
                         lambda m, n, k, idx: (idx[0], k, n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((max(M, 8), tile_n),
                               lambda m, n, k, idx: (m, n)),
        scratch_shapes=[pltpu.VMEM((max(M, 8), tile_n), jnp.float32)],
    )

    def one(x, idx, tiles_all):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((max(M, 8), N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(idx, x, tiles_all)

    EPS = jnp.bfloat16(1e-4)

    @jax.jit
    def step(x, tiles_l):
        def body(x, idx):
            y = one(x, idx, tiles_l)   # tiles_l CLOSED OVER — no xs slice
            return x + y[:, :K] * EPS, None

        x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32)[:, None])
        return x

    return step


def make_cidx_step_t(L, M, N, K, tile_n, tile_k, group=16, mb=3):
    """cistream with k-contiguous tile storage (L, n_n, n_k, S, tile_n)."""
    n_k = K // tile_k
    S = tile_k // 2 + tile_k // group
    S += -S % 32
    kern0 = functools.partial(_copacked_kernel, variant="cstream",
                              group=group, mb=mb, tile_k=tile_k)

    def kern(idx_ref, x_ref, t_ref, o_ref, acc):
        del idx_ref
        return kern0(x_ref, t_ref, o_ref, acc)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, N // tile_n, n_k),
        in_specs=[
            pl.BlockSpec((max(M, 8), tile_k),
                         lambda m, n, k, idx: (m, k)),
            pl.BlockSpec((None, None, None, S, tile_n),
                         lambda m, n, k, idx: (idx[0], n, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((max(M, 8), tile_n),
                               lambda m, n, k, idx: (m, n)),
        scratch_shapes=[pltpu.VMEM((max(M, 8), tile_n), jnp.float32)],
    )

    def one(x, idx, tiles_all):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((max(M, 8), N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(idx, x, tiles_all)

    EPS = jnp.bfloat16(1e-4)

    @jax.jit
    def step(x, tiles_t):
        def body(x, idx):
            y = one(x, idx, tiles_t)
            return x + y[:, :K] * EPS, None

        x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32)[:, None])
        return x

    return step


def make_copacked_step(variant, L, M, N, K, tile_n, tile_k, group=16, mb=3):
    kern = functools.partial(_copacked_kernel, variant=variant, group=group,
                             mb=mb, tile_k=tile_k)
    grid = (1, N // tile_n, K // tile_k)
    S = tile_k // 2 + tile_k // group
    S += -S % 32

    def one(x, tiles):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((max(M, 8), tile_k), lambda m, n, k: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, S, tile_n),
                             lambda m, n, k: (k, n, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((max(M, 8), tile_n),
                                   lambda m, n, k: (m, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((max(M, 8), N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((max(M, 8), tile_n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(x, tiles)

    EPS = jnp.bfloat16(1e-4)

    @jax.jit
    def step(x, tiles_l):
        def body(x, t):
            y = one(x, t)
            return x + y[:, :K] * EPS, None

        x, _ = jax.lax.scan(body, x, tiles_l)
        return x

    return step


def make_xla_step(K, group=16, mb=3):
    EPS = jnp.bfloat16(1e-4)

    @jax.jit
    def step(x, packed_l, exps_l):
        def body(x, sl):
            p, e = sl
            p32 = p.astype(jnp.int32)
            low = (p32 << 28) >> 28
            high = (p32 << 24) >> 28
            codes = jnp.concatenate([low, high], axis=0).astype(jnp.float32)
            kk, n = codes.shape
            scale = jnp.exp2(e.astype(jnp.float32) - mb)
            w = (codes.reshape(kk // group, group, n) * scale[:, None, :]
                 ).reshape(kk, n).astype(jnp.bfloat16)
            y = jnp.dot(x, w, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            return x + y[:, :K] * EPS, None

        x, _ = jax.lax.scan(body, x, (packed_l, exps_l))
        return x

    return step


def make_dense_step(K):
    EPS = jnp.bfloat16(1e-4)

    @jax.jit
    def step(x, ws):
        def body(x, w):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            return x + y[:, :K] * EPS, None

        x, _ = jax.lax.scan(body, x, ws)
        return x

    return step


def marginal(fn, x0, iters=64, warmup=2):
    """Average per-iteration time of one long chained run — a conservative
    upper bound (relay chain latency amortized to <1ms/iter; contention only
    inflates). min over repeats = least-contended sample. See bench.py
    _bench for why the short-vs-long marginal estimator was rejected.

    Drained with ``jax.device_get`` (a VALUE fetch): on this environment's
    remote relay ``block_until_ready`` returns before device execution
    completes (bench.py measured 185 MB "streamed" in 0.09 ms with it), so
    only fetching bytes that depend on the whole chain gives a true time."""
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.device_get(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.device_get(x)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--n", type=int, default=11264)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--tile-n", type=int, default=1024)
    ap.add_argument("--tile-k", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "f32dot", "twodot", "xla", "dense16"])
    ap.add_argument("--check-wide", action="store_true")
    args = ap.parse_args()
    M, N, K, L = args.m, args.n, args.k, args.layers

    COPACKED = ("cstream", "ctwodot", "cbittrick", "cbf16mul")
    NEED_TILES = COPACKED + ("mstream", "mdma", "cistream", "citwodot")
    key = jax.random.PRNGKey(0)
    x0 = (jax.random.normal(key, (M, K)) * 0.1).astype(jnp.bfloat16)
    packed_l, exps_l, dense_l, packed32_l, tiles_l = [], [], [], [], []
    for i in range(L):
        wt = jax.random.normal(jax.random.PRNGKey(10 + i), (K, N),
                               jnp.float32) * 0.02
        codes, exps = quantize_mx(wt, MXINT4)
        packed_l.append(pack_int4_ksplit(codes, tile_k=args.tile_k))
        exps_l.append(exps)
        if "dense16" in args.variants:
            dense_l.append(wt.astype(jnp.bfloat16))
        if "pack32" in args.variants:
            packed32_l.append(pack_int4_k8(codes, tile_k=args.tile_k))
        if any(v.startswith(p) for p in NEED_TILES for v in args.variants):
            from lqer_tpu.ops.storage import pack_w4_tiles

            tiles_l.append(pack_w4_tiles(codes, exps, args.tile_k,
                                         args.tile_n))
    packed_l = jnp.stack(packed_l)
    exps_l = jnp.stack(exps_l)
    if dense_l:
        dense_l = jnp.stack(dense_l)
    if packed32_l:
        packed32_l = jnp.stack(packed32_l)
    if tiles_l:
        tiles_l = jnp.stack(tiles_l)

    w4_bytes = (K * N // 2 + K * N // 16) * L
    for variant in args.variants:
        if variant == "dense16":
            step = make_dense_step(K)
            fn = lambda x: step(x, dense_l)
            nbytes = 2 * K * N * L
        elif variant == "xla":
            step = make_xla_step(K)
            fn = lambda x: step(x, packed_l, exps_l)
            nbytes = w4_bytes
        elif variant == "wide":
            step = make_wide_step(L, M, N, K, args.tile_k)
            fn = lambda x: step(x, packed_l, exps_l)
            nbytes = w4_bytes
        elif variant == "pack32":
            step = make_pack32_step(L, M, N, K, args.tile_n, args.tile_k)
            fn = lambda x: step(x, packed32_l, exps_l)
            nbytes = w4_bytes
        elif variant in COPACKED:
            step = make_copacked_step(variant, L, M, N, K, args.tile_n,
                                      args.tile_k)
            fn = lambda x: step(x, tiles_l)
            nbytes = int(tiles_l.size)  # whole-step bytes incl. row padding
        elif variant in ("cistream", "citwodot", "cibf16mul"):
            step = make_cidx_step(variant, L, M, N, K, args.tile_n,
                                  args.tile_k)
            fn = lambda x: step(x, tiles_l)
            nbytes = int(tiles_l.size)
        elif variant == "cistream_t":
            # k-contiguous tile order: storage (L, n_n, n_k, S, tn) so the
            # k-innermost grid walks ADJACENT memory (latency/prefetch
            # hypothesis for the pallas-vs-XLA-dot fetch gap)
            step = make_cidx_step_t(L, M, N, K, args.tile_n, args.tile_k)
            tiles_t = jnp.swapaxes(tiles_l, 1, 2)
            fn = lambda x: step(x, tiles_t)
            nbytes = int(tiles_l.size)
        elif variant.startswith("mstream") or variant.startswith("mdma"):
            base, _, nb = variant.partition(":")
            step = make_mdma_step(base, L, M, N, K, args.tile_n,
                                  args.tile_k, nbuf=int(nb or 4))
            fn = lambda x: step(x, tiles_l)
            nbytes = int(tiles_l.size)
        else:
            step = make_pallas_step(variant, L, M, N, K, args.tile_n,
                                    args.tile_k)
            fn = lambda x: step(x, packed_l, exps_l)
            nbytes = w4_bytes
        t = min(marginal(fn, x0) for _ in range(args.repeats))
        per_gemm = t / L
        print(f"{variant:>8}: {per_gemm*1e6:8.1f} us/gemm  "
              f"({nbytes/t/1e9:6.0f} GB/s streamed)")

    if args.check_wide:
        # numeric cross-check: wide == twodot_bf16 == full (same math)
        one_full = make_pallas_step("full", 1, M, N, K, args.tile_n,
                                    args.tile_k)
        one_wide = make_wide_step(1, M, N, K, args.tile_k)
        import numpy as np_

        a = np_.asarray(one_full(x0, packed_l[:1], exps_l[:1]))
        b = np_.asarray(one_wide(x0, packed_l[:1], exps_l[:1]))
        print("wide-vs-full chain-out maxerr:", np_.abs(a - b).max())


if __name__ == "__main__":
    main()
