#!/usr/bin/env python
"""Serving demo CLI: load a (quantized, LQER-corrected) model and decode with
the continuous-batching engine.

Usage:
    python experiments/serve.py <config.toml> --prompt "1 2 3" \
        [--max-new-tokens 16] [--slots 4] [--pallas]

Prompts are given as token ids (this offline image has no tokenizers); with a
local HF checkpoint + tokenizer, pass --text instead.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lqer_tpu import models  # noqa: E402
from lqer_tpu.models.checkpoint import load_tensor_dict  # noqa: E402
from lqer_tpu.runners import _get_dtype, build_model_config, build_params  # noqa: E402
from lqer_tpu.serving import DecodeEngine, Request  # noqa: E402
from lqer_tpu.utils import get_logger, load_config  # noqa: E402

logger = get_logger("serve")


def main():
    ap = argparse.ArgumentParser()
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
    args = ap.parse_args()

    config = load_config(args.config)
    dtype = _get_dtype(config.get("evaluate", {}).get("dtype"), "float32")
    cfg = build_model_config(config)
    params = build_params(config, cfg, dtype)

    qcfgs = None
    if not args.fp and config.get("q_config"):
        qcfgs = models.quantize_model(cfg, config["q_config"],
                                      config.get("l_config"))
        params = models.prepare_ptq(params, cfg, qcfgs)
        lrd_path = config.get("evaluate", {}).get("low_rank_dict")
        if lrd_path and Path(str(lrd_path)).exists():
            params = models.load_low_rank_dict(
                params, load_tensor_dict(lrd_path), dtype=dtype
            )
            logger.info("loaded low-rank correctors from %s", lrd_path)

    tokenizer = None
    prompts = []
    if args.text:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(config["model_name"])
        prompts = [tokenizer.encode(t) for t in args.text]
    elif args.prompt:
        prompts = [[int(t) for t in p.split()] for p in args.prompt]
    else:
        prompts = [[1, 2, 3]]

    engine = DecodeEngine(params, cfg, qcfgs, num_slots=args.slots,
                          max_len=args.max_len)
    reqs = [
        Request(prompt_ids=p, max_new_tokens=args.max_new_tokens,
                temperature=args.temperature,
                eos_token_id=getattr(tokenizer, "eos_token_id", None))
        for p in prompts
    ]
    t0 = time.perf_counter()
    engine.run(reqs)
    dt = time.perf_counter() - t0
    total = sum(len(r.output_ids) for r in reqs)
    for i, r in enumerate(reqs):
        if tokenizer:
            print(f"[{i}] {tokenizer.decode(r.output_ids)}")
        else:
            print(f"[{i}] tokens: {r.output_ids}")
    logger.info("%d tokens in %.2fs (%.1f tok/s)", total, dt, total / dt)


if __name__ == "__main__":
    main()
