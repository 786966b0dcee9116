#!/usr/bin/env python
"""Why does the decode step's lm_head cost ~2.8 ms (262 MB bf16 should be
~0.35 ms at the XLA streaming rate)? Probe variants in a chained scan (one
dispatch, marginal between short/long chains):

  matmul_t   — jnp.matmul(h, W.T)            (the step's current form)
  dotgen     — lax.dot_general contracting W's axis 1 (no transpose op)
  pre_t      — W stored pre-transposed (4096, 32000), plain matmul
  f32_h      — h in f32 (promotion pathology check)
  w8         — MXINT8 dequant-GEMM Pallas kernel (weight stream halved)
  w8_argmax  — w8 + in-chain argmax (the engine's real consumer)
"""

import argparse
import os
import sys
import time
from functools import partial

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
    ap.add_argument("--v", type=int, default=32000)
    ap.add_argument("--iters", nargs="+", type=int, default=[8, 32])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cases", nargs="+",
                    default=["matmul_t", "dotgen", "pre_t", "f32_h",
                             "w8", "w8_argmax"])
    args = ap.parse_args()

    M, K, V = args.m, args.k, args.v
    w = (jax.random.normal(jax.random.PRNGKey(0), (V, K), jnp.float32)
         * 0.02).astype(jnp.bfloat16)
    wt = w.T.copy() if hasattr(w.T, "copy") else jnp.asarray(w.T)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

    from lqer_tpu.ops.pallas.dequant_gemm import prepare_w4_weights
    from lqer_tpu.ops.storage import MXINT8
    prep8 = prepare_w4_weights(w.astype(jnp.float32), fmt=MXINT8)
    meta8 = {k: prep8[k] for k in ("tile_k", "tile_n", "fmt")}
    t8 = prep8["tiles"]

    def fold(logits, h):
        # feed a scalar of the logits back into h: dependency without
        # keeping the (M, V) logits alive
        s = jnp.tanh(jnp.sum(logits[:, :8], axis=-1, dtype=jnp.float32))
        return (h + s[:, None].astype(h.dtype) * 1e-6).astype(h.dtype)

    def make(case, iters):
        @jax.jit
        def chain(h, w, wt, t8):
            def body(h, _):
                if case == "matmul_t":
                    lg = jnp.matmul(h, w.T)
                elif case == "dotgen":
                    lg = jax.lax.dot_general(
                        h, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                elif case == "pre_t":
                    lg = jnp.matmul(h, wt)
                elif case == "f32_h":
                    lg = jnp.matmul(h.astype(jnp.float32), w.T)
                elif case in ("w8", "w8_argmax"):
                    from lqer_tpu.ops.pallas.dequant_gemm import (
                        qlinear_w4_fused,
                    )
                    prep = {"tiles": t8, "a": None, "b": None, "bias": None,
                            **meta8}
                    lg = qlinear_w4_fused(
                        h, prep, quant_xa_width=None, quant_out_width=None)
                if case == "w8_argmax":
                    nxt = jnp.argmax(lg, axis=-1)
                    return fold(lg, h) + (nxt[:, None] % 3).astype(h.dtype) \
                        * 1e-9, None
                return fold(lg, h), None

            h, _ = jax.lax.scan(body, h, None, length=iters)
            return h

        return chain

    for case in args.cases:
        res = {}
        for iters in args.iters:
            chain = make(case, iters)
            ts = []
            for r in range(args.repeats + 1):
                t0 = time.perf_counter()
                out = chain(h0, w, wt, t8)
                jax.device_get(out)
                if r:
                    ts.append(time.perf_counter() - t0)
            res[iters] = min(ts)
        its = sorted(res)
        marg = (res[its[-1]] - res[its[0]]) / (its[-1] - its[0])
        gb = (t8.size if case.startswith("w8") else w.size * 2) / 1e9
        print(f"{case:10s} marginal {marg*1e3:7.3f} ms/step "
              f"({gb/marg:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
