#!/usr/bin/env python
"""Split the FULL fused decode step's time into attention / cache-write /
linears+rest by monkeypatching the sub-parts out of the real
`llama_step_scan` (same chain-of-steps methodology as bench.py).

Cases:
  full    — the real step (bench.py's fused side)
  noattn  — `_attend_auto` returns qh (attention kernel + cache read off;
            QKV/O/MLP kernels, norms, rotary, writes, lm_head all remain)
  nowrite — `_cache_write_full` is identity (attention reads stale cache)
  nohead  — lm_head matmul+argmax replaced by a cheap slice-sum token
  bare    — noattn + nowrite + nohead (kernel-linears + norms + rotary)

Run on the real chip; one dispatch per chain (scan of ITERS steps), value
fetch drain, min over repeats.

CAVEAT (staged caches): disabling the single-launch staged path sends the
no* cases down the EAGER staged fallback, whose XLA per-layer ring writes
cost more than the attention being removed — the noattn/bare deltas are
NOT a clean attention split there (measured noattn > full by ~5 ms at 32
layers). Use --cache mxint8 for attention/write decomposition; the staged
cases remain useful for full/nohead/twolaunch comparisons.
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
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cases", nargs="+",
                    default=["full", "noattn", "nowrite", "nohead", "bare"],
                    help="also: twolaunch (fused write+attend off, separate "
                         "write + standard attend kernels)")
    ap.add_argument("--dense", action="store_true",
                    help="split the DENSE bf16 baseline step instead "
                         "(bench.py's yardstick: fp weights, bf16 cache)")
    ap.add_argument("--w8-head", action="store_true",
                    help="pack the lm_head (tied embed) at W8 through the "
                         "dequant-GEMM kernel (serving lm_head_width=8)")
    ap.add_argument("--bf16-head", action="store_true",
                    help="cast the tied-embed lm_head to bf16 (the f32 "
                         "embed doubles the dense head stream)")
    ap.add_argument("--cache", default="mxint8",
                    choices=["mxint8", "mxint8-staged", "mxint4",
                             "mxint4-staged"],
                    help="fused-side KV cache flavor (mxint4* needs "
                    "--kv4 attention configs)")
    ap.add_argument("--kv4", action="store_true",
                    help="width-4 K/V operand quantizers (pairs with the "
                    "mxint4 cache's write grid)")
    args = ap.parse_args()

    import dataclasses

    from lqer_tpu import models
    from lqer_tpu.models import LlamaConfig
    from lqer_tpu.serving import decode as dec
    from experiments.bench_e2e_llama7b import (
        build_7b_backend_and_params,
    )

    RANK, SLOTS = 32, 8
    cfg = dataclasses.replace(LlamaConfig.llama_7b(),
                              num_hidden_layers=args.layers)
    backend, params, qcfgs = build_7b_backend_and_params(cfg, RANK)
    if args.kv4:
        from lqer_tpu import models as _models
        from experiments.bench_e2e_llama7b import Q_CONFIG, _q

        q4 = dict(Q_CONFIG)
        q4["matmul"] = {"name": "flexible",
                        "x_quantizer": _q(8, [1, 16], True),
                        "w_quantizer": _q(4, [1, 16], True)}
        qcfgs = _models.quantize_model(cfg, q4, {"linear": {"rank": RANK}})
    if args.w8_head:
        from lqer_tpu.serving.pallas_backend import pack_lm_head

        backend = pack_lm_head(backend, params, width=8,
                               embed_key="model.embed_tokens.weight")
    arch_mod = models.get_arch_module(cfg)
    stacked, rest = arch_mod.stack_layer_params(params, cfg)
    if args.bf16_head:
        rest["model.embed_tokens.weight"] = rest[
            "model.embed_tokens.weight"].astype(jnp.bfloat16)
    bs = dec.stack_backend(backend, cfg)
    qcfg0 = qcfgs[0] if qcfgs else None
    if args.dense:
        # same construction as bench.py's dense side: random bf16 weights,
        # no backend, no per-layer q-config, bf16 KV cache
        h, inter = cfg.hidden_size, cfg.intermediate_size
        kv = cfg.kv_heads * cfg.head_dim
        shapes = {
            "self_attn.q_proj": (h, h), "self_attn.k_proj": (kv, h),
            "self_attn.v_proj": (kv, h), "self_attn.o_proj": (h, h),
            "mlp.gate_proj": (inter, h), "mlp.up_proj": (inter, h),
            "mlp.down_proj": (h, inter),
        }
        ks = jax.random.split(jax.random.PRNGKey(7), len(shapes))
        for j, (rel, (o, ic)) in enumerate(sorted(shapes.items())):
            stacked[f"{rel}.weight"] = (jax.random.normal(
                ks[j], (args.layers, o, ic), jnp.bfloat16) * 0.01
            ).astype(jnp.bfloat16)
            stacked.pop(f"{rel}.A", None)
            stacked.pop(f"{rel}.B", None)
        qcfg0 = None
        bs = {"arrays": None, "meta": None}
    NL = cfg.num_hidden_layers
    positions = jnp.full((SLOTS,), args.ctx - 2, jnp.int32)

    orig_attend = dec._attend_auto
    orig_write = dec._cache_write_full
    orig_fused = dec._fused_write_attend
    orig_staged = dec._staged_write_attend

    def noattn_attend(qh, *a, **kw):
        return qh.astype(jnp.float32)

    def nowrite_write(cache, li, kh, vh, positions):
        return cache

    def no_fused(*a, **kw):
        # the scan body's single-launch insert+attend path must ALSO be
        # disabled for the no* cases, else it bypasses both patches and the
        # split measures nothing (round-5 fix: noattn ≈ full at round 4)
        return None

    results = {}
    for case in args.cases:
        off_fused = case in ("noattn", "nowrite", "bare", "twolaunch")
        dec._fused_write_attend = no_fused if off_fused else orig_fused
        # the STAGED single-launch path must also be disabled for the no*
        # cases (it is checked before the fused path and bypasses both
        # patches — the staged eager fallback then honors them)
        dec._staged_write_attend = no_fused if off_fused else orig_staged
        dec._attend_auto = noattn_attend if case in ("noattn", "bare") \
            else orig_attend
        dec._cache_write_full = nowrite_write if case in ("nowrite", "bare") \
            else orig_write
        nohead = case in ("nohead", "bare")

        cache = dec.make_cache(
            cfg, SLOTS, args.ctx,
            jnp.bfloat16 if args.dense else args.cache)
        if args.cache.endswith("-staged") and not args.dense:
            # start mid-stream: flushed at the 32-floor of the positions
            cache["flushed"] = (positions // 32) * 32

        @partial(jax.jit, donate_argnums=(1,))
        def chain(tokens, cache, stacked, rest, b_arrays, nohead=nohead):
            def it(state, _):
                tok, cache = state
                logits, cache = dec.llama_step_scan(
                    {}, tok[:, None], cache, positions, cfg, qcfg0,
                    stacked=stacked, rest=rest,
                    backend_stacked=None if args.dense else
                    {"arrays": b_arrays, "meta": bs["meta"]},
                )
                nxt = (jnp.sum(logits[:, 0, :8], axis=-1).astype(jnp.int32)
                       % 100) if nohead else \
                    jnp.argmax(logits[:, 0, :], -1).astype(jnp.int32)
                return (nxt, cache), None

            state, _ = jax.lax.scan(it, (tokens, cache), None,
                                    length=args.iters)
            return state

        if nohead:
            # replace lm_head with a tiny matrix so its matmul vanishes
            rest_c = dict(rest)
            rest_c["lm_head.weight"] = jnp.zeros((128, cfg.hidden_size),
                                                 jnp.bfloat16)
        else:
            rest_c = rest

        state = (jnp.zeros((SLOTS,), jnp.int32), cache)
        ts = []
        for r in range(args.repeats + 1):
            t0 = time.perf_counter()
            state = chain(state[0], state[1], stacked, rest_c, bs["arrays"])
            jax.device_get(state[0])
            t = (time.perf_counter() - t0) / args.iters
            if r:  # skip warmup
                ts.append(t)
        results[case] = min(ts)
        print(f"{case:8s} {min(ts)*1e3:8.2f} ms/step ({args.layers} layers; "
              f"x{32 // args.layers} -> {min(ts)*1e3 * 32 / args.layers:7.2f}"
              " ms at 32)", flush=True)

    dec._attend_auto = orig_attend
    dec._cache_write_full = orig_write
    dec._fused_write_attend = orig_fused
    dec._staged_write_attend = orig_staged
    if "full" in results:
        for k, v in results.items():
            if k != "full":
                print(f"  full - {k:7s} = "
                      f"{(results['full'] - v)*1e3 * 32 / args.layers:6.2f} "
                      "ms at 32 layers", flush=True)


if __name__ == "__main__":
    main()
