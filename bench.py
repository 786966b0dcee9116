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
LAYERS_STACK = 8  # distinct stacked layers per scan (time scales by 32/8)
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


def _chain(fn, x0, iters):
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.device_get(x)
    return time.perf_counter() - t0


def _bench(fn, x0, iters=128, warmup=4):
    """Chained timing: ``fn(x) -> x_next`` so every iteration depends on the
    previous (forces real serial execution — independent dispatch loops have
    been measured above HBM speed-of-light through this environment's remote
    relay, i.e. elided/overlapped). The chain is drained with
    ``jax.device_get`` — a VALUE fetch: on this relay ``block_until_ready``
    returns before device execution completes (round-3 measurement: 185 MB
    streamed "in" 0.09 ms = 2 TB/s with block_until_ready; 9.2 ms = 183 GB/s
    with a value fetch), so only fetching bytes that depend on the whole
    chain gives a true end-to-end time. Returns the long chain's AVERAGE
    per-iteration time: a conservative upper bound on the true step —
    chip contention and the relay's fixed chain latency (amortized at this
    length) can only inflate it, never deflate it. The caller takes the MIN
    over repeats: with a bias-free-upward estimator, the minimum is the
    least-contended sample. (A short-vs-long marginal estimator was tried
    first and rejected: a contention burst during the short chain biases the
    difference LOW, and min-picking then selects exactly those corrupted
    samples.)"""
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.device_get(x)
    return _chain(fn, x0, iters) / iters


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
    # LAYERS_STACK distinct layers are stacked and scanned; the step time
    # scales by LAYERS/LAYERS_STACK (every scan iteration re-streams its
    # layer's weights from HBM, so 8 distinct layers stress HBM identically
    # to 32 while keeping bench memory and setup time reasonable).
    key, k5 = jax.random.split(key)
    x_hid = xq(k5, M, HID)

    preps_qkv, preps_o, mlp_preps = [], [], []
    for li in range(LAYERS_STACK):
        key, ka, kb, kc = jax.random.split(key, 4)
        preps_qkv.append(prepare_w4_weights(
            rnd(ka, (3 * HID, HID), 0.02), rnd(kb, (HID, RANK), 0.01),
            rnd(kc, (RANK, 3 * HID), 0.01), None, tile_k=TILE_K,
        ))
        key, ka, kb, kc = jax.random.split(key, 4)
        preps_o.append(prepare_w4_weights(
            rnd(ka, (HID, HID), 0.02), rnd(kb, (HID, RANK), 0.01),
            rnd(kc, (RANK, HID), 0.01), None, tile_k=TILE_K,
        ))
        key, kg, ku, kd, ka1, kb1, ka2, kb2, ka3, kb3 = jax.random.split(key, 10)
        mlp_preps.append(prepare_mlp_weights(
            rnd(kg, (INTER_PAD, HID), 0.02), rnd(ku, (INTER_PAD, HID), 0.02),
            rnd(kd, (HID, INTER_PAD), 0.02),
            a_gate=rnd(ka1, (HID, RANK), 0.01),
            b_gate=rnd(kb1, (RANK, INTER_PAD), 0.01),
            a_up=rnd(ka2, (HID, RANK), 0.01),
            b_up=rnd(kb2, (RANK, INTER_PAD), 0.01),
            a_down=rnd(ka3, (INTER_PAD, RANK), 0.01),
            b_down=rnd(kb3, (RANK, HID), 0.01),
            tile_k=TILE_K, tile_k2=TILE_K,
        ))

    # ---- stack all LAYERS layers and lax.scan them inside ONE jit ----
    # One model step = ONE device dispatch, exactly like the serving engine's
    # scan decode. This sidesteps two measurement hazards of this
    # environment's remote relay (verified empirically): independent
    # dispatches can overlap across backend resources (reads above HBM
    # speed-of-light), and serially-chained dispatches pay a large per-hop
    # relay latency that buries the device time. Inside one scan, layer
    # serialization is enforced by the real data dependency on device.
    EPS = jnp.bfloat16(1e-4)

    def _stack(trees):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    qkv_arr = _stack([{k: p[k] for k in ("tiles", "a", "b")}
                      for p in preps_qkv])
    o_arr = _stack([{k: p[k] for k in ("tiles", "a", "b")}
                    for p in preps_o])
    MLP_STATIC = ("gated", "fmt", "tile_k", "tile_k2", "tile_i", "tile_n")
    mlp_static = {k: mlp_preps[0][k] for k in MLP_STATIC}
    mlp_arr = _stack([
        {k: v for k, v in p.items()
         if k not in MLP_STATIC and v is not None}
        for p in mlp_preps
    ])

    @jax.jit
    def step_fused(x, qkv_arr, o_arr, mlp_arr):
        def layer(x, sl):
            sq, so, sm = sl
            pq = {**sq, "bias": None, "tile_k": TILE_K, "tile_n": TILE_N,
                  "fmt": preps_qkv[0]["fmt"]}
            po = {**so, "bias": None, "tile_k": TILE_K, "tile_n": TILE_N,
                  "fmt": preps_qkv[0]["fmt"]}
            pm = {**mlp_static, **sm,
                  "tu": sm.get("tu"), "bias_g": None, "bias_u": None,
                  "bias_d": None}
            qkv = qlinear_w4_fused(x, pq, tile_m=8, tile_n=TILE_N,
                                   out_dtype=jnp.bfloat16)
            x1 = x + qkv[:, :HID] * EPS
            o = qlinear_w4_fused(x1, po, tile_m=8, tile_n=TILE_N,
                                 out_dtype=jnp.bfloat16)
            x2 = x + o * EPS
            # tile_i stays 1024: 2816-wide gate/up tiles (the standalone
            # kernel's sweet spot) blow the 16MB scoped-VMEM stack in the
            # megakernel (measured: 21.05M requested)
            mlp = mlp_w4_fused(x2, pm, tile_m=8, tile_i=TILE_N,
                               tile_n=TILE_N, out_dtype=jnp.bfloat16)
            return x + mlp * EPS, None

        x, _ = jax.lax.scan(layer, x, (qkv_arr, o_arr, mlp_arr))
        return x

    def step_fused_fn(x):
        return step_fused(x, qkv_arr, o_arr, mlp_arr)

    # ---- dense bf16 baseline: same shapes, same scan structure ----
    dense_ws = []
    for n_out, n_in in DENSE_SHAPES:
        key, ka = jax.random.split(key)
        dense_ws.append(jnp.stack([
            (jax.random.normal(jax.random.fold_in(ka, i), (n_in, n_out),
                               jnp.float32) * 0.02).astype(jnp.bfloat16)
            for i in range(LAYERS_STACK)
        ]))

    @jax.jit
    def step_dense(x, ws):
        def dot(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        def layer(x, sl):
            w_qkv, w_o, w_gu, w_down = sl
            qkv = dot(x, w_qkv)
            x1 = x + qkv[:, :HID] * EPS
            o = dot(x1, w_o)
            x2 = x + o * EPS
            gu = dot(x2, w_gu)
            h = jnp.maximum(gu[:, :INTER_PAD], 0) * gu[:, INTER_PAD:]
            return x + dot(h, w_down) * EPS, None

        x, _ = jax.lax.scan(layer, x, tuple(ws))
        return x

    def step_dense_fn(x):
        return step_dense(x, dense_ws)

    scale = LAYERS // LAYERS_STACK
    iters = 128 if on_tpu else 2
    repeats = REPEATS if on_tpu else 1
    trace_dir = os.environ.get("BENCH_TRACE")  # profiler capture (xprof)
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t_fused_runs, t_dense_runs = [], []
    for _ in range(repeats):
        t_fused_runs.append(_bench(step_fused_fn, x_hid, iters) * scale)
        t_dense_runs.append(_bench(step_dense_fn, x_hid, iters) * scale)
    if trace_dir:
        jax.profiler.stop_trace()
        print(f"[bench] profiler trace written to {trace_dir}", file=sys.stderr)
    # min-of-N of a bias-free-upward estimator (see _bench): the minimum is
    # the least-contended sample on the shared chip.
    t_fused = min(t_fused_runs)
    t_dense = min(t_dense_runs)
    ratio = t_dense / t_fused

    tokens_per_s = M / t_fused

    w4_bytes = sum((o * i // 2 + o * i // 16) for o, i in DENSE_SHAPES) * LAYERS
    print(
        f"[bench] backend={jax.default_backend()} "
        f"fused_step={t_fused*1e3:.2f}ms dense_step={t_dense*1e3:.2f}ms "
        f"(min of {repeats}; fused spread "
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
