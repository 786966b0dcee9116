#!/usr/bin/env python
"""Baseline evaluation: FP16/FP32 (and any local HF checkpoint) with the
same perplexity / harness code as the quantized pipeline.

Equivalent of `/root/reference/experiments/baselines/baseline.py` (260 LoC).
The reference also evaluates HF-ecosystem AWQ/GPTQ/LLM.int8() checkpoints via
their CUDA kernels; those formats have no TPU runtime and no checkpoints
exist in this offline environment — supported methods here are the
precision baselines (fp32/bf16/fp16) on local checkpoints, which is the row
every BASELINE.md comparison is anchored to.

Usage:
    python experiments/baselines.py <config.toml> --method fp32
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from lqer_tpu import models  # noqa: E402
from lqer_tpu.evaluate import evaluate_perplexity  # noqa: E402
from lqer_tpu.runners import (  # noqa: E402
    _get_dtype,
    _get_split,
    build_model_config,
    build_params,
)
from lqer_tpu.utils import get_logger, load_config  # noqa: E402

logger = get_logger("baselines")

METHOD_DTYPES = {"fp32": "float32", "bf16": "bfloat16", "fp16": "float16"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", type=str)
    ap.add_argument("--method", default="fp32", choices=sorted(METHOD_DTYPES))
    ap.add_argument("--save-dir", type=str, default=None)
    args = ap.parse_args()

    config = load_config(args.config)
    dtype = _get_dtype(METHOD_DTYPES[args.method])
    cfg = build_model_config(config)
    params = build_params(config, cfg, dtype)

    eval_ppl_config = config["evaluate"]["perplexity"]
    test = _get_split(eval_ppl_config, config, "test")

    fwd = jax.jit(lambda ids: models.forward(params, ids, cfg, None))
    results = evaluate_perplexity(
        fwd,
        test,
        batch_size=eval_ppl_config.get("batch_size", 4),
        num_samples=eval_ppl_config.get("num_samples"),
        progress=True,
        description=f"Baseline {args.method} ppl",
    )
    results["method"] = args.method
    logger.info("results:\n%s", json.dumps(results, indent=4))
    if args.save_dir:
        save = Path(args.save_dir)
        save.mkdir(parents=True, exist_ok=True)
        name = eval_ppl_config["dataset"].replace("/", "_")
        with open(save / f"{name}.json", "w") as f:
            json.dump(results, f, indent=4)


if __name__ == "__main__":
    main()
