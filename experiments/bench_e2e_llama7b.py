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
    rng = np.random.default_rng(seed)
    h, inter = cfg.hidden_size, cfg.intermediate_size
    kv = cfg.kv_heads * cfg.head_dim

    params = {
        "model.embed_tokens.weight": jnp.asarray(
            rng.standard_normal((cfg.vocab_size, h)) * 0.02, jnp.bfloat16
        ).astype(jnp.float32),
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
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        layer_params = {}
        for rel, (o, ic) in shapes.items():
            layer_params[f"{p}.{rel}.weight"] = jnp.asarray(
                rng.standard_normal((o, ic)) * 0.01, jnp.float32)
            if rank > 0:
                layer_params[f"{p}.{rel}.A"] = jnp.asarray(
                    rng.standard_normal((ic, rank)) * 0.01, jnp.bfloat16
                ).astype(jnp.float32)
                layer_params[f"{p}.{rel}.B"] = jnp.asarray(
                    rng.standard_normal((rank, o)) * 0.01, jnp.bfloat16
                ).astype(jnp.float32)
        params[f"{p}.input_layernorm.weight"] = jnp.ones((h,), jnp.float32)
        params[f"{p}.post_attention_layernorm.weight"] = jnp.ones(
            (h,), jnp.float32)

        # pack through the one-layer view: present this layer's weights
        # under the layer-0 prefix, then relabel the packed keys back
        p0 = "model.layers.0"
        as_l0 = {k.replace(p, p0, 1): v for k, v in layer_params.items()}
        one = prepare_serving_params(
            as_l0, _OneLayerView(cfg), [qcfgs[i]] if qcfgs else None,
        )
        arrays.update({k.replace(p0, p, 1): v
                       for k, v in one["arrays"].items()})
        meta.update({k.replace(p0, p, 1): v for k, v in one["meta"].items()})
        del layer_params, as_l0
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
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--no-lowrank", action="store_true")
    ap.add_argument("--no-scan", action="store_true")
    args = ap.parse_args()

    cfg = LlamaConfig.llama_7b()
    if args.layers != cfg.num_hidden_layers:
        import dataclasses

        cfg = dataclasses.replace(cfg, num_hidden_layers=args.layers)
    rank = 0 if args.no_lowrank else args.rank

    logger.info("packing %d layers (rank %d)...", cfg.num_hidden_layers, rank)
    backend, params, qcfgs = build_7b_backend_and_params(cfg, rank)
    n_packed = len(backend["meta"])
    logger.info("backend packed: %d kernel entries", n_packed)

    engine = DecodeEngine(
        params, cfg, qcfgs, num_slots=args.slots, max_len=args.max_len,
        cache_dtype=jnp.bfloat16, pallas_backend=backend,
        scan_layers=not args.no_scan,
    )

    # fill every slot, then time pure decode steps via the engine internals
    prompts = [[(7 * i + 3) % 1000 + 2 for _ in range(16)]
               for i in range(args.slots)]
    logger.info("prefilling %d slots (first compile is slow)...", args.slots)
    t0 = time.perf_counter()
    for s, ids in enumerate(prompts):
        engine._admit(Request(prompt_ids=ids, max_new_tokens=10**9), s)
    logger.info("prefill done in %.1fs", time.perf_counter() - t0)

    tokens = jnp.asarray(np.full(args.slots, 5, np.int32))
    positions = jnp.asarray(engine.lengths)
    temps = jnp.zeros((args.slots,), jnp.float32)
    key = jax.random.PRNGKey(0)

    logger.info("compiling decode step...")
    t0 = time.perf_counter()
    toks, cache = engine._decode_step(engine.params, engine.cache, tokens,
                                      positions, key, temps)
    jax.block_until_ready(toks)
    logger.info("decode step compiled+ran in %.1fs", time.perf_counter() - t0)

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
    print(f"[e2e-7b] layers={cfg.num_hidden_layers} slots={args.slots} "
          f"rank={rank} decode: best={best:.1f}ms median={med:.1f}ms "
          f"-> {args.slots / (best / 1e3):.1f} tok/s (best), "
          f"{args.slots / (med / 1e3):.1f} tok/s (median)")


if __name__ == "__main__":
    main()
