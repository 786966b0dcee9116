#!/usr/bin/env python
"""End-to-end Llama-7B-scale decode on one TPU chip: the real serving stack
(DecodeEngine + lax.scan layers + Pallas backend with fused QKV and the MLP
megakernel) at flagship size.

Weights are random but full-size (7B): each layer is generated, packed to
MXINT4 serving format, and freed, so host memory stays bounded (~1 GB
transient per layer; packed total ~3.7 GB on device). Only
embeddings/norms/lm_head live in the params dict — every linear is served
from the packed backend.

Usage:
    python experiments/bench_e2e_llama7b.py [--steps 20] [--slots 8]
        [--max-len 512] [--layers 32] [--no-lowrank]

Prints per-step latency and tokens/s. NOTE on this environment: each decode
step pays the remote-tunnel dispatch floor (~40-65 ms); the per-step device
compute is the number that transfers to directly-attached TPUs.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lqer_tpu import models  # noqa: E402
from lqer_tpu.models import LlamaConfig  # noqa: E402
from lqer_tpu.serving import DecodeEngine, Request  # noqa: E402
from lqer_tpu.serving.pallas_backend import (  # noqa: E402
    prepare_serving_params,
)
from lqer_tpu.utils import get_logger  # noqa: E402

logger = get_logger("bench_e2e")


def build_7b_backend_and_params(cfg, rank: int, seed: int = 0):
    """Layer-streamed packing: random fp32 layer weights -> packed backend,
    freed immediately. Params keep only embeddings/norms/head."""
    h, inter = cfg.hidden_size, cfg.intermediate_size
    kv = cfg.kv_heads * cfg.head_dim

    params = {
        "model.embed_tokens.weight": jax.jit(
            lambda k: jax.random.normal(
                k, (cfg.vocab_size, h), jnp.float32) * 0.02
        )(jax.random.PRNGKey(seed)),
        "model.norm.weight": jnp.ones((h,), jnp.float32),
    }
    qcfgs = models.quantize_model(cfg, Q_CONFIG, {"linear": {"rank": rank}})

    arrays, meta = {}, {}
    shapes = {
        "self_attn.q_proj": (h, h), "self_attn.k_proj": (kv, h),
        "self_attn.v_proj": (kv, h), "self_attn.o_proj": (h, h),
        "mlp.gate_proj": (inter, h), "mlp.up_proj": (inter, h),
        "mlp.down_proj": (h, inter),
    }
    t0 = time.perf_counter()
    p0 = "model.layers.0"

    def gen_l0(key):
        """Random layer weights generated ON DEVICE (no 800MB/layer host
        transfer through the tunnel)."""
        out = {}
        ks = jax.random.split(key, 3 * len(shapes))
        for j, (rel, (o, ic)) in enumerate(sorted(shapes.items())):
            out[f"{p0}.{rel}.weight"] = (
                jax.random.normal(ks[3 * j], (o, ic), jnp.float32) * 0.01)
            if rank > 0:
                out[f"{p0}.{rel}.A"] = jax.random.normal(
                    ks[3 * j + 1], (ic, rank), jnp.bfloat16
                ).astype(jnp.float32) * 0.01
                out[f"{p0}.{rel}.B"] = jax.random.normal(
                    ks[3 * j + 2], (rank, o), jnp.bfloat16
                ).astype(jnp.float32) * 0.01
        return out

    # one jitted generate+pack executable, traced once: the eager path
    # dispatches hundreds of small ops per layer through the remote tunnel
    # (~80 s/layer); jitted it is one launch per layer. The static meta is
    # captured as a trace-time side effect (identical for every layer).
    meta0: dict = {}

    @jax.jit
    def pack_layer(key):
        out = prepare_serving_params(
            gen_l0(key), _OneLayerView(cfg), [qcfgs[0]] if qcfgs else None,
        )
        meta0.update(out["meta"])
        return out["arrays"]

    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        params[f"{p}.input_layernorm.weight"] = jnp.ones((h,), jnp.float32)
        params[f"{p}.post_attention_layernorm.weight"] = jnp.ones(
            (h,), jnp.float32)
        packed = jax.block_until_ready(
            pack_layer(jax.random.PRNGKey(seed * 1000 + i)))
        arrays.update({k.replace(p0, p, 1): v for k, v in packed.items()})
        meta.update({k.replace(p0, p, 1): v for k, v in meta0.items()})
        if i % 8 == 0:
            logger.info("packed layer %d/%d (%.1fs)", i + 1,
                        cfg.num_hidden_layers, time.perf_counter() - t0)
    return {"arrays": arrays, "meta": meta}, params, qcfgs


class _OneLayerView:
    """cfg proxy that makes prepare_serving_params see exactly one layer,
    so packing streams layer-by-layer (keys relabeled by the caller)."""

    def __init__(self, cfg):
        self._cfg = cfg

    def __getattr__(self, name):
        if name == "num_hidden_layers":
            return 1
        return getattr(self._cfg, name)


def _q(width, block, skip):
    return {
        "name": "block_fp", "width": width, "exponent_width": 8,
        "exponent_bias": None, "block_size": block, "skip_first_dim": skip,
    }


Q_CONFIG = {
    "linear": {
        "name": "flexible_lqer", "is_ptq": True,
        "x_quantizer": _q(8, [1, 16], True),
        "w_quantizer": _q(4, [1, 16], False),
        "b_quantizer": _q(8, [1, 16], False),
    },
    "matmul": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
               "w_quantizer": _q(8, [1, 16], True)},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-len", type=int, nargs="+", default=[512],
                    help="one engine per length, same packed weights — "
                    "same-process comparison isolates L-scaled cost")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--no-lowrank", action="store_true")
    ap.add_argument("--no-scan", action="store_true")
    ap.add_argument("--eval-chunk", type=int, default=0,
                    help="also time a full-sequence eval chunk (GPTQ-style "
                    "perplexity forward) of this length through the kernels")
    ap.add_argument("--cache", default="bf16",
                    choices=["bf16", "mxint8", "mxint8-staged", "mxint4",
                             "mxint4-staged"],
                    help="KV-cache layout; mxint8 engages the quantized-"
                    "cache decode-attention kernel (in-VMEM decode); "
                    "mxint8-staged adds the round-5 ring-staged writes")
    ap.add_argument("--w8-head", action="store_true",
                    help="pack the lm_head (tied embed) at W8 "
                    "(lm_head_width=8)")
    ap.add_argument("--kv4", action="store_true",
                    help="width-4 K/V operand quantizers (pair with "
                    "--cache mxint4[-staged]; halves cache memory, see "
                    "experiments/kv_cache_quality.py for the accuracy "
                    "tradeoff)")
    args = ap.parse_args()

    cfg = LlamaConfig.llama_7b()
    if args.layers != cfg.num_hidden_layers:
        import dataclasses

        cfg = dataclasses.replace(cfg, num_hidden_layers=args.layers)
    rank = 0 if args.no_lowrank else args.rank

    logger.info("packing %d layers (rank %d)...", cfg.num_hidden_layers, rank)
    backend, params, qcfgs = build_7b_backend_and_params(cfg, rank)
    if args.kv4:
        q4 = dict(Q_CONFIG)
        q4["matmul"] = {"name": "flexible",
                        "x_quantizer": _q(8, [1, 16], True),
                        "w_quantizer": _q(4, [1, 16], True)}
        qcfgs = models.quantize_model(cfg, q4, {"linear": {"rank": rank}})
    n_packed = len(backend["meta"])
    logger.info("backend packed: %d kernel entries", n_packed)
    if args.w8_head:
        # head runs from the packed W8 tiles; the f32 tied embedding
        # (524 MB at 7B) only serves lookups — bf16 halves it and was the
        # HBM margin for the 8-slot 2048 staged config (round 5)
        params["model.embed_tokens.weight"] = params[
            "model.embed_tokens.weight"].astype(jnp.bfloat16)

    results = []
    for max_len in args.max_len:
        cache_dtype = args.cache if args.cache.startswith("mxint") \
            else jnp.bfloat16
        engine = DecodeEngine(
            params, cfg, qcfgs, num_slots=args.slots, max_len=max_len,
            cache_dtype=cache_dtype, pallas_backend=backend,
            scan_layers=not args.no_scan,
            lm_head_width=8 if args.w8_head else None,
            # release the per-prefix packed copy once stacked (~2.2 GB) —
            # only on the LAST length (earlier engines share the backend)
            consume_backend=(not args.no_scan
                             and max_len == args.max_len[-1]),
        )

        # fill every slot (ONE batched prefill), then time decode steps via
        # the engine internals
        prompts = [[(7 * i + 3) % 1000 + 2 for _ in range(16)]
                   for i in range(args.slots)]
        logger.info("L=%d: prefilling %d slots (first compile is slow)...",
                    max_len, args.slots)
        t0 = time.perf_counter()
        engine._admit_batch([
            (Request(prompt_ids=ids, max_new_tokens=10**9), s)
            for s, ids in enumerate(prompts)
        ])
        logger.info("prefill done in %.1fs", time.perf_counter() - t0)

        tokens = jnp.asarray(np.full(args.slots, 5, np.int32))
        positions = jnp.asarray(engine.lengths)
        temps = jnp.zeros((args.slots,), jnp.float32)
        key = jax.random.PRNGKey(0)

        t0 = time.perf_counter()
        toks, cache = engine._decode_step(engine.params, engine.cache,
                                          tokens, positions, key, temps)
        jax.block_until_ready(toks)
        logger.info("decode step compiled+ran in %.1fs",
                    time.perf_counter() - t0)

        lat = []
        for i in range(args.steps):
            t0 = time.perf_counter()
            toks, cache = engine._decode_step(engine.params, cache, toks,
                                              positions + 1 + i, key, temps)
            jax.block_until_ready(toks)
            lat.append(time.perf_counter() - t0)
        lat_ms = np.array(lat) * 1e3
        best = float(lat_ms.min())
        med = float(np.median(lat_ms))
        results.append((max_len, best, med))
        print(f"[e2e-7b] layers={cfg.num_hidden_layers} slots={args.slots} "
              f"rank={rank} cache={args.cache} L={max_len} decode: best={best:.1f}ms "
              f"median={med:.1f}ms "
              f"-> {args.slots / (best / 1e3):.1f} tok/s (best), "
              f"{args.slots / (med / 1e3):.1f} tok/s (median)")
        del engine, cache

    if len(results) >= 2:
        (l0, b0, _), (l1, b1, _) = results[0], results[-1]
        per_layer_us = (b1 - b0) / cfg.num_hidden_layers * 1e3
        print(f"[e2e-7b] L-scaled cost: ({l1}-{l0}) -> "
              f"{per_layer_us:.0f} us/layer attention-side at L={l1}")

    if args.eval_chunk:
        # perplexity-eval throughput: one full-sequence chunk through the
        # fused kernels + prefill attention kernel (runners.py
        # evaluate.pallas_backend path)
        arch_fwd = models.get_arch_module(cfg).forward

        s_len = args.eval_chunk
        b_meta = backend["meta"]

        @jax.jit
        def eval_fwd(p, b_arrays, ids):
            return arch_fwd(
                p, ids, cfg, qcfgs, fused_attention=True,
                backend={"arrays": b_arrays, "meta": b_meta},
            )

        ids = jnp.ones((1, s_len), jnp.int32)
        t0 = time.perf_counter()
        out = jax.block_until_ready(eval_fwd(params, backend["arrays"], ids))
        logger.info("eval chunk compiled+ran in %.1fs", time.perf_counter() - t0)
        lat = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = jax.block_until_ready(
                eval_fwd(params, backend["arrays"], ids))
            lat.append(time.perf_counter() - t0)
        best = min(lat)
        print(f"[e2e-7b] eval chunk s={s_len}: best={best*1e3:.0f}ms -> "
              f"{s_len / best:.0f} tokens/s perplexity-eval throughput")


if __name__ == "__main__":
    main()
