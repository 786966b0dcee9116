#!/usr/bin/env python
"""LLM.int8()-style outlier census feeding the hardware-area study.

Equivalent of `/root/reference/experiments/hw_performance/profile_llm_int8.py`
(149 LoC): run calibration batches through the UNQUANTIZED model with
threshold taps on every linear, count activation columns with any |x| >=
threshold (default 6.0), and derive the high/low-precision sub-matrix shapes
used by the external MASE circuit-area estimator (cost-model specs in the
reference's `hw_performance/README.md`; see cost_model.py here for a
self-contained re-implementation of the comparative area model).
"""

import argparse
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lqer_tpu import models  # noqa: E402
from lqer_tpu.profiler import ThresholdAccumulator, batch_threshold_tap  # noqa: E402
from lqer_tpu.runners import build_model_config, build_params, _get_split  # noqa: E402
from lqer_tpu.utils import get_logger, load_config  # noqa: E402

logger = get_logger("hw_performance")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", type=str, help="pipeline toml (model + profile)")
    ap.add_argument("--threshold", type=float, default=6.0)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--num-samples", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--save-dir", type=str, default=None)
    args = ap.parse_args()

    config = load_config(args.config)
    cfg = build_model_config(config)
    params = build_params(config, cfg)

    acc = ThresholdAccumulator(args.threshold, args.seq_len)
    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            w = params[prefix + ".weight"]
            acc.register(prefix, w.shape[0], w.shape[1])

    profile_cfg = dict(config["profile"])
    profile_cfg["max_length"] = min(
        args.seq_len, profile_cfg.get("max_length", args.seq_len)
    )
    train = _get_split(profile_cfg, config, "train")

    @jax.jit
    def profiled(ids):
        stats = {}
        logits = models.forward(
            params, ids, cfg, None, tap=batch_threshold_tap(stats, args.threshold)
        )
        return logits, stats

    n_batches = max(1, args.num_samples // args.batch_size)
    for bi in range(n_batches):
        batch = train[bi * args.batch_size : (bi + 1) * args.batch_size]
        if len(batch) == 0:
            break
        _, stats = profiled(jnp.asarray(batch))
        acc.update(stats)
        logger.info("threshold batch %d/%d", bi + 1, n_batches)

    results = acc.finalize()
    rows = [{"name": k, **{kk: str(vv) for kk, vv in v.items()}}
            for k, v in results.items()]
    for r in rows[:5]:
        logger.info("%s", r)

    if args.save_dir:
        save = Path(args.save_dir)
        save.mkdir(parents=True, exist_ok=True)
        with open(save / "thresholds.json", "w") as f:
            json.dump(results, f, indent=2, default=str)
        keys = sorted({k for r in rows for k in r})
        with open(save / "thresholds.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
        logger.info("saved to %s", save)


if __name__ == "__main__":
    main()
