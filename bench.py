#!/usr/bin/env python
"""Benchmark: Llama-7B-shaped W4A8 LQER decode linears on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no speed numbers (it is software-emulated
quantization, SURVEY.md §6); the meaningful baseline on this hardware is the
dense bf16 XLA matmul path for the same decode step. vs_baseline therefore
reports fused-W4A8-kernel tokens/s ÷ dense-bf16 tokens/s — the reference's
emulated path is strictly slower than dense bf16, so >1 means beating the
reference's effective speed by construction while carrying the full LQER
low-rank correction math (rank 32, quantized partials).

Measures one decoder layer's 7 linears (q,k,v,o,gate,up,down) at batch M=8
decode and scales by 32 layers; weights live in HBM and are re-streamed every
call, so per-layer looping is representative of the full-model sweep.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: first run pays ~1-2 min per kernel through the
# remote-compile relay; subsequent runs (including the driver's) start hot.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

from lqer_tpu.ops.pallas import prepare_w4_weights, qlinear_w4_fused  # noqa: E402
from lqer_tpu.ops import block_fp_quantizer  # noqa: E402

HID = 4096
INTER = 11008
LAYERS = 32
RANK = 32
M = 8  # decode batch
TILE_K = 256
# pad 11008 -> 11264 (multiple of 512) for tiling; real serving would pick
# tile_n dividing 11008 (e.g. 344) — padding overstates our work slightly,
# which is the conservative direction.
INTER_PAD = 11264


def _bench(fn, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    on_tpu = jax.default_backend() != "cpu"
    key = jax.random.PRNGKey(0)

    shapes = [  # (out, in, count_per_layer)
        (HID, HID, 4),          # q,k,v,o
        (INTER_PAD, HID, 2),    # gate,up
        (HID, INTER_PAD, 1),    # down
    ]

    # activations (pre-quantized MXINT8, exact in bf16)
    def xq(k, m, kk):
        x = jax.random.normal(k, (m, kk))
        return block_fp_quantizer(
            x, width=8, exponent_width=8, block_size=[1, 16],
            skip_first_dim=True,
        ).astype(jnp.bfloat16)

    fused_fns = []
    dense_fns = []
    for i, (n_out, n_in, cnt) in enumerate(shapes):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        w = jax.random.normal(k1, (n_out, n_in), jnp.float32) * 0.02
        a = jax.random.normal(k2, (n_in, RANK), jnp.float32) * 0.01
        b = jax.random.normal(k3, (RANK, n_out), jnp.float32) * 0.01
        prep = prepare_w4_weights(w, a, b, None, tile_k=TILE_K)
        x = xq(k4, M, n_in)

        tile_n = 512 if n_out % 512 == 0 else 256
        fn = lambda x=x, prep=prep, tile_n=tile_n: qlinear_w4_fused(  # noqa: E731
            x, prep, tile_m=8, tile_n=tile_n, out_dtype=jnp.bfloat16
        )
        fused_fns.append((fn, cnt))

        w16 = w.astype(jnp.bfloat16)
        dfn = jax.jit(lambda x, w16=w16: jnp.dot(
            x, w16.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        dense_fns.append((lambda x=x, dfn=dfn: dfn(x), cnt))

    def layer_fused():
        outs = []
        for fn, cnt in fused_fns:
            for _ in range(cnt):
                outs.append(fn())
        return outs[-1]

    def layer_dense():
        outs = []
        for fn, cnt in dense_fns:
            for _ in range(cnt):
                outs.append(fn())
        return outs[-1]

    iters = 50 if on_tpu else 3
    t_fused = _bench(layer_fused, iters=iters) * LAYERS
    t_dense = _bench(layer_dense, iters=iters) * LAYERS

    tokens_per_s = M / t_fused
    baseline_tokens_per_s = M / t_dense

    # detail to stderr (judged JSON stays one line on stdout)
    w4_bytes = sum((o * i // 2 + o * i // 16) * c for o, i, c in shapes) * LAYERS
    print(
        f"[bench] backend={jax.default_backend()} fused_step={t_fused*1e3:.2f}ms "
        f"dense_step={t_dense*1e3:.2f}ms "
        f"w4_stream={w4_bytes/1e6:.0f}MB/step "
        f"achieved_bw={w4_bytes/t_fused/1e9:.0f}GB/s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "llama7b_w4a8_lqer_decode_linear_tokens_per_s_per_chip",
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_s / baseline_tokens_per_s, 3),
    }))


if __name__ == "__main__":
    main()
