#!/usr/bin/env python
"""Sweep fused-kernel tile configs on the real TPU: achieved HBM bandwidth
for the Llama-7B decode shapes. Used to pick the defaults in bench.py."""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

_CACHE = str(Path(__file__).resolve().parents[1] / ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from lqer_tpu.ops import block_fp_quantizer  # noqa: E402
from lqer_tpu.ops.pallas import prepare_w4_weights, qlinear_w4_fused  # noqa: E402


def bench(fn, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--tile-ns", type=int, nargs="+", default=[256, 512, 1024, 2048])
    ap.add_argument("--tile-ks", type=int, nargs="+", default=[256, 512, 1024])
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    M, N, K, R = args.m, args.n, args.k, args.rank
    x = jax.random.normal(k1, (M, K))
    x_q = block_fp_quantizer(
        x, width=8, exponent_width=8, block_size=[1, 16], skip_first_dim=True
    ).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (N, K)) * 0.02
    a = jax.random.normal(k3, (K, R)) * 0.01 if R else None
    b = jax.random.normal(k4, (R, N)) * 0.01 if R else None

    bytes_streamed = K * N // 2 + K * N // 16  # packed codes + exponents

    print(f"M={M} N={N} K={K} rank={R}; w4 stream {bytes_streamed/1e6:.1f}MB")
    for tk in args.tile_ks:
        if K % tk:
            continue
        prep = prepare_w4_weights(w, a, b, None, tile_k=tk)
        for tn in args.tile_ns:
            if N % tn:
                continue
            try:
                fn = lambda: qlinear_w4_fused(  # noqa: E731
                    x_q, prep, tile_m=8, tile_n=tn, out_dtype=jnp.bfloat16
                )
                t = bench(fn)
                print(f"  tile_k={tk:5d} tile_n={tn:5d}: {t*1e6:8.1f}us  "
                      f"{bytes_streamed/t/1e9:6.1f} GB/s")
            except Exception as e:
                print(f"  tile_k={tk:5d} tile_n={tn:5d}: FAIL {str(e)[:80]}")


if __name__ == "__main__":
    main()
