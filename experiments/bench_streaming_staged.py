#!/usr/bin/env python
"""Real-chip timing for the streaming-L regimes: one layer at 7B decode
shapes, chained steps (one dispatch), marginal ms/layer.

Cases:
  staged    — decode_attention_quantized_streaming_staged (round 5: single
              logical step, staging write folded into pass 1)
  twopass   — round-4 baseline: standalone window write
              (write_kv_rows_all_layers) + decode_attention_quantized_streaming
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
    ap.add_argument("--l", type=int, default=32768)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--kvh", type=int, default=32)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", nargs="+", type=int, default=[4, 12])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cases", nargs="+", default=["staged", "twopass"])
    args = ap.parse_args()

    from lqer_tpu.ops.pallas.decode_attention import (
        decode_attention_quantized_streaming,
        decode_attention_quantized_streaming_staged,
    )
    from lqer_tpu.ops.pallas.cache_write import write_kv_rows_all_layers
    from lqer_tpu.serving.kv_cache import init_quantized_kv_cache
    from lqer_tpu.parallel.collectives import mx8_encode

    B, KVH, d, L = args.slots, args.kvh, args.d, args.l
    H = KVH
    cache = init_quantized_kv_cache(1, B, KVH, d, L, staged=True)
    pos0 = L - 2 - max(args.iters)
    cache["flushed"] = jnp.full((B,), (pos0 // 32) * 32, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, 1, d))
    kh = jax.random.normal(jax.random.PRNGKey(1), (B, KVH, 1, d))
    vh = jax.random.normal(jax.random.PRNGKey(2), (B, KVH, 1, d))
    li = jnp.asarray([0], jnp.int32)
    MAIN = ("k_codes", "k_exps", "v_codes", "v_exps")
    STAGE = ("k_stage_codes", "k_stage_exps", "v_stage_codes",
             "v_stage_exps")

    def make_chain(case, iters):
        @jax.jit
        def chain(q, kh, vh, cache):
            def it(carry, i):
                acc, cache = carry
                pos = jnp.full((B,), pos0, jnp.int32) + i
                if case == "staged":
                    attn, ks, ke, vs, ve = \
                        decode_attention_quantized_streaming_staged(
                            q, *(cache[k] for k in MAIN),
                            *(cache[k] for k in STAGE),
                            kh, vh, pos, cache["flushed"], li, scaling=0.09)
                    cache = {**cache, "k_stage_codes": ks,
                             "k_stage_exps": ke, "v_stage_codes": vs,
                             "v_stage_exps": ve}
                else:
                    kc, ke_ = mx8_encode(kh, 16, zero_fill=1.0)
                    vc, ve_ = mx8_encode(vh, 16, zero_fill=1.0)
                    news = (jnp.swapaxes(kc, -1, -2)[None],
                            jnp.swapaxes(ke_, -1, -2)[None],
                            jnp.swapaxes(vc, -1, -2)[None],
                            jnp.swapaxes(ve_, -1, -2)[None])
                    upd = write_kv_rows_all_layers(
                        tuple(cache[k] for k in MAIN), news, pos)
                    cache = {**cache, **dict(zip(MAIN, upd))}
                    attn = decode_attention_quantized_streaming(
                        q, *(cache[k] for k in MAIN), pos, scaling=0.09,
                        layer_index=li)
                return (acc + jnp.sum(attn) * 1e-6, cache), None

            (acc, cache), _ = jax.lax.scan(
                it, (jnp.float32(0), cache),
                jnp.arange(iters, dtype=jnp.int32))
            return acc

        return chain

    for case in args.cases:
        res = {}
        for iters in args.iters:
            chain = make_chain(case, iters)
            ts = []
            for r in range(args.repeats + 1):
                t0 = time.perf_counter()
                out = chain(q, kh, vh, cache)
                jax.device_get(out)
                if r:
                    ts.append(time.perf_counter() - t0)
            res[iters] = min(ts)
        its = sorted(res)
        marg = (res[its[-1]] - res[its[0]]) / (its[-1] - its[0])
        gb = 2 * B * KVH * L * (d + d // 16) * 1e-9
        print(f"{case:8s} L={L}: {marg*1e3:7.2f} ms/layer-step "
              f"({gb:.2f} GB one-pass stream -> "
              f"{gb * 1.5 / marg:.0f} GB/s two-pass eff)", flush=True)


if __name__ == "__main__":
    main()
