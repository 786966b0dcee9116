#!/usr/bin/env python
"""Measure per-`pallas_call` launch overhead in-situ: chain N dependent
launches of the SAME W4 dequant-GEMM inside one jit (lax.scan, output feeds
input) and report marginal ms/launch vs the kernel's isolated streaming
time. The round-4 step split showed the fused linears at ~215 GB/s in-situ
vs ~365 GB/s isolated — if the gap is per-launch overhead, halving launches
per layer recovers it (ROADMAP "megakernel" item).

Methodology per .claude/skills/verify: one dispatch per chain; marginal
time between short and long chains; min over repeats.
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--layers", type=int, default=16,
                    help="distinct stacked weight layers (HBM-resident)")
    ap.add_argument("--iters", nargs="+", type=int, default=[16, 64])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from lqer_tpu.ops.pallas.dequant_gemm import (
        prepare_w4_weights, qlinear_w4_fused,
    )

    L = args.layers
    ks = jax.random.split(jax.random.PRNGKey(0), L)
    preps = [prepare_w4_weights(
        jax.random.normal(ks[i], (args.n, args.k)) * 0.02)
        for i in range(L)]
    tiles = jnp.stack([p["tiles"] for p in preps])  # (L, nk, nn, S, tn)
    meta = {k: preps[0][k] for k in ("tile_k", "tile_n", "fmt")}
    gb_per_launch = tiles.size / L / 1e9

    x = jax.random.normal(jax.random.PRNGKey(1), (args.m, args.k))

    def make_chain(iters):
        @jax.jit
        def chain(x, tiles):
            def body(h, li):
                prep = {"tiles": tiles, "a": None, "b": None, "bias": None,
                        **meta}
                y = qlinear_w4_fused(
                    h, prep, quant_xa_width=None, quant_out_width=None,
                    layer_index=li.reshape(1),
                )
                # renormalize so the chain doesn't overflow; keeps the
                # dependency (next launch consumes this output)
                h2 = y[:, :args.k] if args.n >= args.k else jnp.pad(
                    y, ((0, 0), (0, args.k - args.n)))
                return h2 / (1.0 + jnp.max(jnp.abs(h2))), li

            h, _ = jax.lax.scan(body, x, jnp.arange(iters,
                                                    dtype=jnp.int32) % L)
            return h

        return chain

    results = {}
    for iters in args.iters:
        chain = make_chain(iters)
        ts = []
        for r in range(args.repeats + 1):
            t0 = time.perf_counter()
            out = chain(x, tiles)
            jax.device_get(out)  # relay: block_until_ready is not enough
            t = time.perf_counter() - t0
            if r:
                ts.append(t)
        results[iters] = min(ts)
        print(f"iters={iters:4d}: total {min(ts)*1e3:8.2f} ms "
              f"({min(ts)/iters*1e6:8.1f} us/launch)", flush=True)

    its = sorted(results)
    if len(its) >= 2:
        short, long_ = its[0], its[-1]
        marginal = (results[long_] - results[short]) / (long_ - short)
        rate = gb_per_launch / marginal
        print(f"marginal: {marginal*1e6:.1f} us/launch  "
              f"({gb_per_launch*1e3:.2f} MB/launch -> {rate:.0f} GB/s "
              "in-situ incl. launch overhead)", flush=True)
        print(f"implied overhead vs 365 GB/s floor: "
              f"{(marginal - gb_per_launch/365)*1e6:.1f} us/launch",
              flush=True)


if __name__ == "__main__":
    main()
