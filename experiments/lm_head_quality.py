#!/usr/bin/env python
"""W8 lm_head quality-neutrality study (VERDICT r4 #7 / ROADMAP round 5).

The serving path's packed lm_head quantizes ONLY the head weight to MXINT8
([1,16]-group block_fp, width 8); activations stay bf16 like the dense
matmul. This script measures the perplexity impact of that weight grid on
the OFFLINE pipeline proxy (random-init models + synthetic data — the same
evaluation the rest of the offline parity suite uses; real-checkpoint
numbers need the networked runbook, BASELINE.md):

  for each model size: ppl with fp head vs W8 head vs W4 head, plus the
  worst-case per-token logit perturbation.

Run on CPU: `python experiments/lm_head_quality.py`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.ops.storage import MXFormat, dequantize_mx, quantize_mx


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


def head_roundtrip(w, width):
    codes, exps = quantize_mx(jnp.asarray(w, jnp.float32).T,
                              MXFormat(width=width))
    return dequantize_mx(codes, exps, MXFormat(width=width),
                         jnp.float32).T.astype(w.dtype)


def ppl_with_head(cfg, params, qcfgs, ids, head_w):
    fwd = models.get_arch_module(cfg).forward
    p = dict(params)
    p["lm_head.weight"] = head_w
    logits = fwd(p, ids[:, :-1], cfg, qcfgs)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return float(jnp.exp(nll.mean())), np.asarray(logits, np.float32)


def main():
    sizes = {
        "tiny-9M": dict(vocab_size=512, hidden=128, layers=2, heads=4,
                        kv_heads=4, inter=256, max_pos=256),
        "small-60M": dict(vocab_size=2048, hidden=512, layers=4, heads=8,
                          kv_heads=8, inter=1024, max_pos=256),
        "base-220M": dict(vocab_size=4096, hidden=1024, layers=8, heads=16,
                          kv_heads=16, inter=2048, max_pos=256),
    }
    print(f"{'model':10s} {'fp ppl':>10s} {'W8 ppl':>10s} {'dW8':>9s} "
          f"{'W4 ppl':>10s} {'dW4':>9s} {'max|dlogit| W8':>15s}")
    for name, kw in sizes.items():
        cfg = LlamaConfig.tiny(**kw)
        params = models.init_params(cfg, jax.random.PRNGKey(0))
        qcfgs = models.quantize_model(cfg, Q_CONFIG, {"linear": {"rank": 16}})
        params = models.prepare_ptq(params, cfg, qcfgs)
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 128), 0,
                                 cfg.vocab_size)
        w = params["lm_head.weight"]
        ppl_fp, lg_fp = ppl_with_head(cfg, params, qcfgs, ids, w)
        ppl_w8, lg_w8 = ppl_with_head(cfg, params, qcfgs, ids,
                                      head_roundtrip(w, 8))
        ppl_w4, _ = ppl_with_head(cfg, params, qcfgs, ids,
                                  head_roundtrip(w, 4))
        dmax = float(np.abs(lg_w8 - lg_fp).max())
        print(f"{name:10s} {ppl_fp:10.4f} {ppl_w8:10.4f} "
              f"{ppl_w8-ppl_fp:+9.4f} {ppl_w4:10.4f} {ppl_w4-ppl_fp:+9.4f} "
              f"{dmax:15.5f}")


if __name__ == "__main__":
    main()
