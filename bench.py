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

Measures one decoder layer's linears at batch M=8 decode and scales by 32
layers; weights live in HBM and are re-streamed every call, so per-layer
looping is representative of the full-model sweep. Projections are fused the
way a serving stack lays them out (QKV together, gate|up together), and tile
sizes come from experiments/bench_kernel_sweep.py (tile_k=1024, tile_n=1024
on v5e).
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
LAYERS = 32
RANK = 32
M = 8  # decode batch
TILE_K = 1024
TILE_N = 1024
# pad 11008 -> 11264 (multiple of 1024) for tiling; padding slightly
# overstates our work, the conservative direction.
INTER_PAD = 11264

# serving layout: fused projections (out, in)
SHAPES = [
    (3 * HID, HID),        # qkv
    (HID, HID),            # o
    (2 * INTER_PAD, HID),  # gate|up
    (HID, INTER_PAD),      # down
]


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

    def xq(k, m, kk):
        x = jax.random.normal(k, (m, kk))
        return block_fp_quantizer(
            x, width=8, exponent_width=8, block_size=[1, 16],
            skip_first_dim=True,
        ).astype(jnp.bfloat16)

    fused_fns = []
    dense_fns = []
    for n_out, n_in in SHAPES:
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        w = jax.random.normal(k1, (n_out, n_in), jnp.float32) * 0.02
        a = jax.random.normal(k2, (n_in, RANK), jnp.float32) * 0.01
        b = jax.random.normal(k3, (RANK, n_out), jnp.float32) * 0.01
        prep = prepare_w4_weights(w, a, b, None, tile_k=TILE_K)
        x = xq(k4, M, n_in)

        fn = lambda x=x, prep=prep: qlinear_w4_fused(  # noqa: E731
            x, prep, tile_m=8, tile_n=TILE_N, out_dtype=jnp.bfloat16
        )
        fused_fns.append(fn)

        w16 = w.astype(jnp.bfloat16)
        dfn = jax.jit(lambda x, w16=w16: jnp.dot(
            x, w16.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        dense_fns.append(lambda x=x, dfn=dfn: dfn(x))

    def layer_fused():
        out = None
        for fn in fused_fns:
            out = fn()
        return out

    def layer_dense():
        out = None
        for fn in dense_fns:
            out = fn()
        return out

    iters = 50 if on_tpu else 3
    t_fused = _bench(layer_fused, iters=iters) * LAYERS
    t_dense = _bench(layer_dense, iters=iters) * LAYERS

    tokens_per_s = M / t_fused
    baseline_tokens_per_s = M / t_dense

    w4_bytes = sum((o * i // 2 + o * i // 16) for o, i in SHAPES) * LAYERS
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
