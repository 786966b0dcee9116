#!/usr/bin/env python
"""Probe the fused dequant-GEMM's bottleneck on the real TPU.

Methodology (matches bench.py): L stacked layers scanned inside ONE jit so a
whole multi-layer step is a single dispatch (the remote relay both overlaps
independent dispatches across backend resources and adds large per-hop
latency to chained dispatches — scan sidesteps both), chained iterations,
and the per-iteration time taken as the marginal between a short and a long
chain.

Variants of the W4 dequant pipeline inside the kernel:
  full     — shifts -> concat -> f32 -> scale-mul -> bf16 -> dot (today)
  f32dot   — skip the final bf16 cast; dot in f32 (identical products for
             MXINT grids)
  twodot   — no concat: two half-K dots on the separately-scaled nibble
             planes
  dense16  — XLA bf16 dot streaming real (K,N) bf16 weights (2x HBM bytes)
  xla      — no pallas: jnp unpack+scale+dot, XLA-fused
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


def marginal(fn, x0, lo=4, hi=20, warmup=2):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)

    def chain(iters):
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
        return time.perf_counter() - t0

    return (chain(hi) - chain(lo)) / (hi - lo)


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
    args = ap.parse_args()
    M, N, K, L = args.m, args.n, args.k, args.layers

    key = jax.random.PRNGKey(0)
    x0 = (jax.random.normal(key, (M, K)) * 0.1).astype(jnp.bfloat16)
    packed_l, exps_l, dense_l = [], [], []
    for i in range(L):
        wt = jax.random.normal(jax.random.PRNGKey(10 + i), (K, N),
                               jnp.float32) * 0.02
        codes, exps = quantize_mx(wt, MXINT4)
        packed_l.append(pack_int4_ksplit(codes, tile_k=args.tile_k))
        exps_l.append(exps)
        if "dense16" in args.variants:
            dense_l.append(wt.astype(jnp.bfloat16))
    packed_l = jnp.stack(packed_l)
    exps_l = jnp.stack(exps_l)
    if dense_l:
        dense_l = jnp.stack(dense_l)

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
        else:
            step = make_pallas_step(variant, L, M, N, K, args.tile_n,
                                    args.tile_k)
            fn = lambda x: step(x, packed_l, exps_l)
            nbytes = w4_bytes
        t = min(marginal(fn, x0) for _ in range(args.repeats))
        per_gemm = t / L
        print(f"{variant:>8}: {per_gemm*1e6:8.1f} us/gemm  "
              f"({nbytes/t/1e9:6.0f} GB/s streamed)")


if __name__ == "__main__":
    main()
