#!/usr/bin/env python
"""Serving benchmark: continuous-batching decode through the engine, fused
Pallas backend vs software emulation, on real hardware.

Usage: python experiments/bench_serving.py [--layers 8] [--hidden 2048]
       [--slots 8] [--tokens 64] [--emulated]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

from lqer_tpu import models  # noqa: E402
from lqer_tpu.models import LlamaConfig  # noqa: E402
from lqer_tpu.serving import DecodeEngine, Request  # noqa: E402
from lqer_tpu.serving.pallas_backend import prepare_serving_params  # noqa: E402
from lqer_tpu.utils import get_logger  # noqa: E402

logger = get_logger("bench_serving")


def _q(width, block, skip):
    return {"name": "block_fp", "width": width, "exponent_width": 8,
            "exponent_bias": None, "block_size": block, "skip_first_dim": skip}


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
L_CONFIG = {"linear": {"rank": 32}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--inter", type=int, default=5632)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=256)
    ap.add_argument("--emulated", action="store_true",
                    help="software emulation instead of the Pallas backend")
    args = ap.parse_args()

    cfg = LlamaConfig(
        vocab_size=args.vocab, hidden_size=args.hidden,
        intermediate_size=args.inter, num_hidden_layers=args.layers,
        num_attention_heads=args.heads, num_key_value_heads=args.heads,
        max_position_embeddings=args.max_len,
    )
    t0 = time.perf_counter()
    params = models.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    backend = None
    if not args.emulated:
        backend = prepare_serving_params(params, cfg, qcfgs)
    params = models.prepare_ptq(params, cfg, qcfgs)
    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            od, idim = params[prefix + ".weight"].shape
            params[prefix + ".A"] = jnp.zeros((idim, 32))
            params[prefix + ".B"] = (
                jax.random.normal(jax.random.PRNGKey(i), (32, od)) * 0.01)
    if backend is not None:
        # refresh A/B in the packed backend too
        backend = prepare_serving_params(
            {**params}, cfg, qcfgs)
    logger.info("setup %.1fs", time.perf_counter() - t0)

    engine = DecodeEngine(params, cfg, qcfgs, num_slots=args.slots,
                          max_len=args.max_len, pallas_backend=backend)
    import numpy as np

    rng = np.random.default_rng(0)
    reqs = [
        Request(prompt_ids=list(rng.integers(1, args.vocab, size=12)),
                max_new_tokens=args.tokens)
        for _ in range(args.slots)
    ]
    # warm (compiles prefill + decode)
    warm = [Request(prompt_ids=[1, 2, 3], max_new_tokens=2)]
    t0 = time.perf_counter()
    engine.run(warm)
    logger.info("warmup (compiles) %.1fs", time.perf_counter() - t0)

    t0 = time.perf_counter()
    engine.run(reqs)
    dt = time.perf_counter() - t0
    total = sum(len(r.output_ids) for r in reqs)
    mode = "emulated" if args.emulated else "pallas"
    print(f"[serving-{mode}] layers={args.layers} hidden={args.hidden} "
          f"slots={args.slots}: {total} tokens in {dt:.2f}s = "
          f"{total/dt:.1f} tok/s")


if __name__ == "__main__":
    main()
