"""Serving CLI: load a (quantized, LQER-corrected) model and decode with the
continuous-batching engine. Exposed as ``lqer-tpu serve`` and
``experiments/serve.py``.

Prompts are given as token ids (offline images have no tokenizers); with a
local HF checkpoint + tokenizer, pass ``--text`` instead.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

from .. import models
from ..models.checkpoint import load_tensor_dict
from ..utils import get_logger, load_config
from . import DecodeEngine, Request

logger = get_logger("serve")


def main(argv=None):
    from ..runners import _get_dtype, build_model_config, build_params

    ap = argparse.ArgumentParser(prog="lqer-tpu serve")
    ap.add_argument("config", type=str)
    ap.add_argument("--prompt", action="append", default=None,
                    help="space-separated token ids; repeatable for batching")
    ap.add_argument("--text", action="append", default=None,
                    help="text prompts (needs a tokenizer)")
    ap.add_argument("--max-new-tokens", type=int, default=16)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--fp", action="store_true", help="skip quantization")
    ap.add_argument("--scan-layers", action="store_true",
                    help="lax.scan layer loop (depth-independent compile)")
    ap.add_argument("--cache-dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float32", "mxint8",
                             "mxint8-staged", "mxint4", "mxint4-staged"],
                    help="KV cache storage (mxint8 = 8.5 bits/value; "
                    "*-staged = round-5 ring-staged writes; mxint4 = "
                    "4.5 bits, opt-in — see kv_cache_quality.py)")
    ap.add_argument("--lm-head-width", type=int, default=None,
                    help="pack the lm_head at this MXINT width (8 is "
                    "quality-neutral — ROADMAP round-5 study); needs "
                    "--pallas")
    ap.add_argument("--pallas", action="store_true",
                    help="route linears through the fused W4A8 kernel")
    ap.add_argument("--trace-dir", type=str, default=None,
                    help="capture a jax.profiler trace of the run (xprof)")
    args = ap.parse_args(argv)

    config = load_config(args.config)
    dtype = _get_dtype(config.get("evaluate", {}).get("dtype"), "float32")
    cfg = build_model_config(config)
    params = build_params(config, cfg, dtype)

    qcfgs = None
    backend = None
    if not args.fp and config.get("q_config"):
        qcfgs = models.quantize_model(cfg, config["q_config"],
                                      config.get("l_config"))
        lrd_path = config.get("evaluate", {}).get("low_rank_dict")
        if lrd_path and Path(str(lrd_path)).exists():
            params = models.load_low_rank_dict(
                params, load_tensor_dict(lrd_path), dtype=dtype
            )
            logger.info("loaded low-rank correctors from %s", lrd_path)
        if args.pallas:
            from .pallas_backend import prepare_serving_params

            # pack from the ORIGINAL weights (see prepare_serving_params)
            backend = prepare_serving_params(params, cfg, qcfgs)
        params = models.prepare_ptq(params, cfg, qcfgs)

    tokenizer = None
    if args.text:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(config["model_name"])
        prompts = [tokenizer.encode(t) for t in args.text]
    elif args.prompt:
        prompts = [[int(t) for t in p.split()] for p in args.prompt]
    else:
        prompts = [[1, 2, 3]]

    import jax.numpy as jnp

    cache_dtype = (args.cache_dtype if args.cache_dtype.startswith("mxint")
                   else getattr(jnp, args.cache_dtype))
    engine = DecodeEngine(params, cfg, qcfgs, num_slots=args.slots,
                          max_len=args.max_len, cache_dtype=cache_dtype,
                          lm_head_width=args.lm_head_width,
                          pallas_backend=backend,
                          scan_layers=args.scan_layers)
    reqs = [
        Request(prompt_ids=p, max_new_tokens=args.max_new_tokens,
                temperature=args.temperature,
                eos_token_id=getattr(tokenizer, "eos_token_id", None))
        for p in prompts
    ]
    if args.trace_dir:
        import jax

        jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    engine.run(reqs)
    dt = time.perf_counter() - t0
    if args.trace_dir:
        import jax

        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", args.trace_dir)
    total = sum(len(r.output_ids) for r in reqs)
    for i, r in enumerate(reqs):
        if tokenizer:
            print(f"[{i}] {tokenizer.decode(r.output_ids)}")
        else:
            print(f"[{i}] tokens: {r.output_ids}")
    logger.info("%d tokens in %.2fs (%.1f tok/s)", total, dt, total / dt)


if __name__ == "__main__":
    main()
