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
looping is representative of the full-model sweep. Layout matches the
serving stack: ONE fused QKV launch, one O launch, and the MLP megakernel
(gate|up → silu·mul → act-quant → down in a single pallas_call, VMEM-resident
intermediate). Tile sizes from experiments/bench_kernel_sweep.py
(tile_k=1024, tile_n=1024 on v5e). Reported value is the best of
BENCH_REPEATS runs (the shared chip sees sustained contention windows; the
minimum is the least-contended sample — see the aggregation note below).
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
from lqer_tpu.ops.pallas.mlp_fused import (  # noqa: E402
    mlp_w4_fused, prepare_mlp_weights,
)
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
REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))

DENSE_SHAPES = [
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

    def rnd(k, shape, scale):
        return jax.random.normal(k, shape, jnp.float32) * scale

    # ---- fused serving layout: qkv, o, mlp megakernel ----
    key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    x_hid = xq(k5, M, HID)

    preps = []
    for n_out, n_in in [(3 * HID, HID), (HID, HID)]:
        key, ka, kb, kc = jax.random.split(key, 4)
        preps.append(prepare_w4_weights(
            rnd(ka, (n_out, n_in), 0.02), rnd(kb, (n_in, RANK), 0.01),
            rnd(kc, (RANK, n_out), 0.01), None, tile_k=TILE_K,
        ))
    key, kg, ku, kd, ka1, kb1, ka2, kb2, ka3, kb3 = jax.random.split(key, 10)
    mlp_prep = prepare_mlp_weights(
        rnd(kg, (INTER_PAD, HID), 0.02), rnd(ku, (INTER_PAD, HID), 0.02),
        rnd(kd, (HID, INTER_PAD), 0.02),
        a_gate=rnd(ka1, (HID, RANK), 0.01), b_gate=rnd(kb1, (RANK, INTER_PAD), 0.01),
        a_up=rnd(ka2, (HID, RANK), 0.01), b_up=rnd(kb2, (RANK, INTER_PAD), 0.01),
        a_down=rnd(ka3, (INTER_PAD, RANK), 0.01), b_down=rnd(kb3, (RANK, HID), 0.01),
        tile_k=TILE_K, tile_k2=TILE_K,
    )

    def layer_fused():
        qkv = qlinear_w4_fused(x_hid, preps[0], tile_m=8, tile_n=TILE_N,
                               out_dtype=jnp.bfloat16)
        o = qlinear_w4_fused(x_hid, preps[1], tile_m=8, tile_n=TILE_N,
                             out_dtype=jnp.bfloat16)
        mlp = mlp_w4_fused(x_hid, mlp_prep, tile_m=8, tile_i=TILE_N,
                           tile_n=TILE_N, out_dtype=jnp.bfloat16)
        return qkv, o, mlp

    # ---- dense bf16 baseline, same shapes ----
    dense_fns = []
    for n_out, n_in in DENSE_SHAPES:
        key, ka, kb = jax.random.split(key, 3)
        w16 = rnd(ka, (n_out, n_in), 0.02).astype(jnp.bfloat16)
        x = xq(kb, M, n_in)
        dfn = jax.jit(lambda x, w16=w16: jnp.dot(
            x, w16.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        dense_fns.append(lambda x=x, dfn=dfn: dfn(x))

    def layer_dense():
        out = None
        for fn in dense_fns:
            out = fn()
        return out

    iters = 50 if on_tpu else 2
    repeats = REPEATS if on_tpu else 1
    trace_dir = os.environ.get("BENCH_TRACE")  # profiler capture (xprof)
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t_fused_runs, t_dense_runs = [], []
    for _ in range(repeats):
        t_fused_runs.append(_bench(layer_fused, iters=iters) * LAYERS)
        t_dense_runs.append(_bench(layer_dense, iters=iters) * LAYERS)
    if trace_dir:
        jax.profiler.stop_trace()
        print(f"[bench] profiler trace written to {trace_dir}", file=sys.stderr)
    # best-of-N: the shared chip sees sustained contention windows (observed
    # spreads of 7x within a minute); the minimum is the least-contended
    # sample and the only stable estimator of the kernel's own speed.
    t_fused = min(t_fused_runs)
    t_dense = min(t_dense_runs)
    ratio = t_dense / t_fused

    tokens_per_s = M / t_fused

    w4_bytes = sum((o * i // 2 + o * i // 16) for o, i in DENSE_SHAPES) * LAYERS
    print(
        f"[bench] backend={jax.default_backend()} "
        f"fused_step={t_fused*1e3:.2f}ms dense_step={t_dense*1e3:.2f}ms "
        f"(best of {repeats}; fused spread "
        f"{min(t_fused_runs)*1e3:.2f}-{max(t_fused_runs)*1e3:.2f}ms) "
        f"w4_stream={w4_bytes/1e6:.0f}MB/step "
        f"achieved_bw={w4_bytes/t_fused/1e9:.0f}GB/s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "llama7b_w4a8_lqer_decode_linear_tokens_per_s_per_chip",
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(ratio, 3),
    }))


if __name__ == "__main__":
    main()
