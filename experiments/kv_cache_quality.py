#!/usr/bin/env python
"""KV-cache width quality study (round 5): what do the MXINT8 (8.5 b/val)
and opt-in MXINT4 (4.5 b/val) caches do to decode quality?

Offline proxy (random-init models + synthetic prompts — real-checkpoint
numbers need the networked runbook): decode ``--steps`` tokens teacher-
forced on the FP-cache trajectory and report, per cache flavor, the mean
softmax KL vs the fp cache, the max |Δlogit|, and the greedy-token
agreement rate. The attention configs pair each cache with its matching
write-grid operand width (quantize-once-at-write semantics).

Run on CPU: python experiments/kv_cache_quality.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import argparse

import jax.numpy as jnp
import numpy as np

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.serving import decode as dec


def _q(width, block, skip):
    return {
        "name": "block_fp", "width": width, "exponent_width": 8,
        "exponent_bias": None, "block_size": block, "skip_first_dim": skip,
    }


def _qconfig(kv_width):
    mm_w = {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
            "w_quantizer": _q(kv_width, [1, 16], True)} \
        if kv_width else None
    return {
        "linear": {
            "name": "flexible_lqer", "is_ptq": True,
            "x_quantizer": _q(8, [1, 16], True),
            "w_quantizer": _q(4, [1, 16], False),
            "b_quantizer": _q(8, [1, 16], False),
        },
        **({"matmul": mm_w} if mm_w else {}),
    }


def trajectory(cfg, params, qcfgs, cache_dtype, tokens, prompt):
    cache = dec.make_cache(cfg, 1, 256, cache_dtype)
    pos = jnp.zeros((1,), jnp.int32)
    logits, cache = dec.model_step(params, prompt, cache, pos, cfg, qcfgs)
    pos = pos + prompt.shape[1]
    outs = []
    for t in tokens:
        logits, cache = dec.model_step(params, t.reshape(1, 1), cache, pos,
                                       cfg, qcfgs)
        outs.append(np.asarray(logits[0, 0], np.float32))
        pos = pos + 1
    return np.stack(outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--seeds", type=int, default=3,
                    help="model/prompt seeds averaged per row (the single-"
                    "seed token-agreement numbers swing widely)")
    args = ap.parse_args()

    sizes = {
        "tiny-9M": dict(vocab_size=512, hidden=128, layers=2, heads=4,
                        kv_heads=4, inter=256, max_pos=256),
        "small-60M": dict(vocab_size=2048, hidden=512, layers=4, heads=8,
                          kv_heads=8, inter=1024, max_pos=256),
        "base-220M": dict(vocab_size=4096, hidden=1024, layers=8, heads=16,
                          kv_heads=16, inter=2048, max_pos=256),
    }
    print(f"{'model':10s} {'cache':10s} {'meanKL':>10s} {'max|dlogit|':>12s} "
          f"{'tok agree':>10s}   (mean over seeds)")
    for name, kw in sizes.items():
        cfg = LlamaConfig.tiny(**kw)
        stats = {"mxint8": [], "mxint4": []}
        for seed in range(args.seeds):
            params = models.init_params(cfg, jax.random.PRNGKey(seed))
            qcfgs8 = models.quantize_model(cfg, _qconfig(8),
                                           {"linear": {"rank": 16}})
            qcfgs4 = models.quantize_model(cfg, _qconfig(4),
                                           {"linear": {"rank": 16}})
            params = models.prepare_ptq(params, cfg, qcfgs8)
            prompt = jax.random.randint(jax.random.PRNGKey(100 + seed),
                                        (1, 8), 0, cfg.vocab_size)
            # teacher-forced token sequence, greedy from an fp run
            cache = dec.make_cache(cfg, 1, 256, jnp.float32)
            pos = jnp.zeros((1,), jnp.int32)
            logits, cache = dec.model_step(params, prompt, cache, pos, cfg,
                                           qcfgs8)
            pos = pos + prompt.shape[1]
            toks = []
            t = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            for _ in range(args.steps):
                toks.append(t)
                logits, cache = dec.model_step(params, t.reshape(1, 1),
                                               cache, pos, cfg, qcfgs8)
                t = jnp.argmax(logits[0, 0]).astype(jnp.int32)
                pos = pos + 1
            ref = trajectory(cfg, params, qcfgs8, jnp.float32, toks, prompt)
            for label, dtype, qc in (("mxint8", "mxint8", qcfgs8),
                                     ("mxint4", "mxint4", qcfgs4)):
                got = trajectory(cfg, params, qc, dtype, toks, prompt)
                pr = jax.nn.softmax(jnp.asarray(ref), axis=-1)
                lg = jax.nn.log_softmax(jnp.asarray(got), axis=-1)
                lr = jax.nn.log_softmax(jnp.asarray(ref), axis=-1)
                kl = float(jnp.mean(jnp.sum(pr * (lr - lg), axis=-1)))
                dmax = float(np.abs(got - ref).max())
                agree = float((got.argmax(-1) == ref.argmax(-1)).mean())
                stats[label].append((kl, dmax, agree))
        for label in ("mxint8", "mxint4"):
            a = np.array(stats[label])
            print(f"{name:10s} {label:10s} {a[:,0].mean():10.5f} "
                  f"{a[:,1].mean():12.4f} {a[:,2].mean():10.3f}")


if __name__ == "__main__":
    main()
