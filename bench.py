#!/usr/bin/env python
"""Benchmark: Llama-7B-shaped W4A8 LQER FULL decode step on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no speed numbers (it is software-emulated
quantization, SURVEY.md §6); the meaningful baseline on this hardware is the
dense bf16 XLA path for the same decode step. vs_baseline therefore reports
fused-W4A8 tokens/s ÷ dense-bf16 tokens/s — the reference's emulated path is
strictly slower than dense bf16, so >1 means beating the reference's
effective speed by construction while carrying the full LQER low-rank
correction math (rank 32, quantized partials).

Round-3 change (VERDICT item 2): the measured step is the WHOLE decode
layer — fused QKV + decode attention over a 2048-token KV cache (MXINT8
quantized cache on the fused side, bf16 on the dense side) + O + MLP
megakernel + norms/residuals — i.e. `serving.decode.llama_step_scan`, the
serving engine's actual step, not just the linears. The JSON also carries
`frac_of_sol`: measured step time vs the HBM speed-of-light time for the
bytes the step must stream (packed weights + quantized KV reads; v5e
HBM ≈ 819 GB/s), so attention regressions and fetch inefficiency are both
visible.

Measures LAYERS_STACK distinct stacked layers scanned in ONE dispatch and
scales by 32/LAYERS_STACK; weights and cache live in HBM and are re-streamed
every call. Timing methodology (hard-won, round 2): chained iterations of
the single-dispatch step, drained with a VALUE fetch (`jax.device_get` — on
this environment's remote relay `block_until_ready` returns before device
execution completes), reported as min-over-repeats of the long chain's
average — a bias-free-upward estimator.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HID = 4096
INTER = 11008
LAYERS = 32
LAYERS_STACK = 8   # distinct stacked layers per scan (time scales by 32/8)
RANK = 32
SLOTS = 8          # decode batch
CTX = 2048         # reference eval context (llama-7b.toml seq_len)
KV_HEADS = 32
HEAD_DIM = 128
HBM_BW = 819e9     # v5e HBM speed of light
REPEATS = int(os.environ.get("BENCH_REPEATS", "4"))
ITERS = int(os.environ.get("BENCH_ITERS", "48"))


def _bench(chain_fn, state0, iters, warmup=True):
    """``chain_fn(state) -> state`` runs ITERS decode steps inside ONE
    dispatch (lax.scan over iterations): the environment's per-dispatch
    relay hop (~0.25-0.8 ms) amortizes to <1% of the measured chain instead
    of ~56 us/layer (measured intercept of per-dispatch chaining). Returns
    the chain's average per-step time — still bias-free upward (contention
    and the single hop only inflate). Drained with a VALUE fetch — see
    module docstring."""
    if warmup:
        state0 = chain_fn(state0)
        jax.device_get(state0[0])
    t0 = time.perf_counter()
    state = chain_fn(state0)
    jax.device_get(state[0])
    return (time.perf_counter() - t0) / iters, state


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    import dataclasses

    from lqer_tpu.models import LlamaConfig
    from lqer_tpu.serving.decode import llama_step_scan, make_cache, stack_backend
    from experiments.bench_e2e_llama7b import (
        Q_CONFIG, build_7b_backend_and_params,
    )
    from lqer_tpu import models

    cfg = dataclasses.replace(LlamaConfig.llama_7b(),
                              num_hidden_layers=LAYERS_STACK)
    if not on_tpu:  # CPU smoke: shrink everything, interpret-mode kernels
        cfg = LlamaConfig.tiny(vocab_size=256, hidden=256, layers=2, heads=4,
                               kv_heads=4, inter=512, max_pos=128)

    t0 = time.perf_counter()
    backend, params, qcfgs = build_7b_backend_and_params(cfg, RANK)
    print(f"[bench] packed {cfg.num_hidden_layers} layers in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    layers = cfg.num_hidden_layers
    scale = LAYERS // layers if on_tpu else 1
    ctx = CTX if on_tpu else 64
    slots = SLOTS

    # W8 lm_head on the fused side (round 5): the dense bf16 head matmul
    # measured ~2.9 ms in-situ — MXINT8 weight tiles through the dequant-GEMM
    # kernel halve the head stream (quality study: ROADMAP round-5 table).
    from lqer_tpu.serving.pallas_backend import pack_lm_head

    backend = pack_lm_head(backend, params, width=8)

    arch_mod = models.get_arch_module(cfg)
    stacked, rest = arch_mod.stack_layer_params(params, cfg)
    # the dense baseline's lm_head (tied embed) must be bf16, not the
    # generator's f32 — an f32 head doubles its stream and would weaken the
    # yardstick (round-5 split: f32 head ≈ 2.9 ms, bf16 ≈ 1.4)
    for k in ("model.embed_tokens.weight", "lm_head.weight"):
        if k in rest:
            rest[k] = rest[k].astype(jnp.bfloat16)
    bs = stack_backend(backend, cfg)
    qcfg0 = qcfgs[0] if qcfgs else None

    # ---- fused full step: scan layers, ring-staged MXINT8 KV cache, ------
    # decode attention. Positions ADVANCE through the chain (round 5) so the
    # staged cache's flush cadence is paid honestly (~1 flush per 32 steps);
    # each repeat restarts at base (the cache is a timing fixture).
    from functools import partial

    iters = ITERS if on_tpu else 2
    cache_f = make_cache(cfg, slots, ctx,
                         "mxint8-staged" if on_tpu else "mxint8")
    base_pos = ctx - 2 - iters
    positions = jnp.full((slots,), ctx - 2, jnp.int32)  # prefill/SoL ref

    def _reset_staged(cache):
        if "flushed" in cache:
            cache = dict(cache)
            cache["flushed"] = jnp.full(
                (slots,), (base_pos // 32) * 32, jnp.int32)
        return cache

    @partial(jax.jit, donate_argnums=(1,))
    def chain_fused(tokens, cache, stacked, rest, b_arrays):
        cache = _reset_staged(cache)

        def it(state, i):
            tok, cache = state
            logits, cache = llama_step_scan(
                {}, tok[:, None], cache,
                jnp.full((slots,), base_pos, jnp.int32) + i, cfg, qcfg0,
                stacked=stacked, rest=rest,
                backend_stacked={"arrays": b_arrays, "meta": bs["meta"]},
            )
            return (jnp.argmax(logits[:, 0, :], -1).astype(jnp.int32),
                    cache), None

        state, _ = jax.lax.scan(it, (tokens, cache),
                                jnp.arange(iters, dtype=jnp.int32))
        return state

    def fused_fn(state):
        tok, cache = state
        return chain_fused(tok, cache, stacked, rest, bs["arrays"])

    # ---- dense bf16 baseline: same step, fp weights, bf16 KV cache --------
    # dense fp weights at bf16 (generated on device, layer-stacked)
    def dense_stacked(key):
        h, inter = cfg.hidden_size, cfg.intermediate_size
        kv = cfg.kv_heads * cfg.head_dim
        shapes = {
            "self_attn.q_proj": (h, h), "self_attn.k_proj": (kv, h),
            "self_attn.v_proj": (kv, h), "self_attn.o_proj": (h, h),
            "mlp.gate_proj": (inter, h), "mlp.up_proj": (inter, h),
            "mlp.down_proj": (h, inter),
        }
        out = dict(stacked)
        ks = jax.random.split(key, len(shapes))
        for j, (rel, (o, ic)) in enumerate(sorted(shapes.items())):
            out[f"{rel}.weight"] = (jax.random.normal(
                ks[j], (layers, o, ic), jnp.bfloat16) * 0.01
            ).astype(jnp.bfloat16)
            out.pop(f"{rel}.A", None)
            out.pop(f"{rel}.B", None)
        return out

    stacked_dense = jax.jit(dense_stacked)(jax.random.PRNGKey(7))
    cache_d = make_cache(cfg, slots, ctx, jnp.bfloat16)

    @partial(jax.jit, donate_argnums=(1,))
    def chain_dense(tokens, cache, stacked_d, rest):
        def it(state, i):
            tok, cache = state
            logits, cache = llama_step_scan(
                {}, tok[:, None], cache,
                jnp.full((slots,), base_pos, jnp.int32) + i, cfg, None,
                stacked=stacked_d, rest=rest, backend_stacked=None,
            )
            return (jnp.argmax(logits[:, 0, :], -1).astype(jnp.int32),
                    cache), None

        state, _ = jax.lax.scan(it, (tokens, cache),
                                jnp.arange(iters, dtype=jnp.int32))
        return state

    def dense_fn(state):
        tok, cache = state
        return chain_dense(tok, cache, stacked_dense, rest)

    # ---- strongest-dense secondary yardstick (VERDICT r3 item 4) --------
    # XLA's eager bf16-cache attention streams at ~216 GB/s and is the dense
    # step's dominant cost (37 of 61 ms, bench_step_split round 4); giving
    # the dense side this framework's fp decode-attention kernel
    # (LQER_FP_ATTN_KERNEL) is the best baseline we can construct. Reported
    # as dense_kernel_step_ms + vs_best_baseline next to the primary
    # XLA-only vs_baseline.
    os.environ["LQER_FP_ATTN_KERNEL"] = "1"

    @partial(jax.jit, donate_argnums=(1,))
    def chain_dense_k(tokens, cache, stacked_d, rest):
        def it(state, i):
            tok, cache = state
            logits, cache = llama_step_scan(
                {}, tok[:, None], cache,
                jnp.full((slots,), base_pos, jnp.int32) + i, cfg, None,
                stacked=stacked_d, rest=rest, backend_stacked=None,
            )
            return (jnp.argmax(logits[:, 0, :], -1).astype(jnp.int32),
                    cache), None

        state, _ = jax.lax.scan(it, (tokens, cache),
                                jnp.arange(iters, dtype=jnp.int32))
        return state

    cache_dk = make_cache(cfg, slots, ctx, jnp.bfloat16)
    state_dk = (jnp.zeros((slots,), jnp.int32), cache_dk)
    # trace now (env read at trace time), then restore the default
    state_dk = chain_dense_k(*state_dk, stacked_dense, rest)
    jax.device_get(state_dk[0])
    del os.environ["LQER_FP_ATTN_KERNEL"]

    def dense_k_fn(state):
        tok, cache = state
        return chain_dense_k(tok, cache, stacked_dense, rest)

    tok0 = jnp.zeros((slots,), jnp.int32)
    repeats = REPEATS if on_tpu else 1
    trace_dir = os.environ.get("BENCH_TRACE")  # profiler capture (xprof)
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t_f, t_d, t_dk = [], [], []
    state_f, state_d = (tok0, cache_f), (tok0, cache_d)
    for r in range(repeats):
        t, state_f = _bench(fused_fn, state_f, iters, warmup=(r == 0))
        t_f.append(t * scale)
        t, state_d = _bench(dense_fn, state_d, iters, warmup=(r == 0))
        t_d.append(t * scale)
        t, state_dk = _bench(dense_k_fn, state_dk, iters, warmup=False)
        t_dk.append(t * scale)
    if trace_dir:
        jax.profiler.stop_trace()
        print(f"[bench] profiler trace written to {trace_dir}", file=sys.stderr)
    t_fused, t_dense = min(t_f), min(t_d)
    t_dense_k = min(t_dk)
    ratio = t_dense / t_fused
    tokens_per_s = slots / t_fused

    # ---- prefill throughput + MFU roofline (VERDICT r4 item 3) -----------
    # one 2048-token admission chunk through the ENGINE's prefill step
    # (llama_step_scan, fresh cache, fresh_prefill=True → fused-admission
    # kernel attention on the quantized side, eager XLA attention on the
    # dense side — exactly what each implementation would serve with).
    pf_ids = jnp.zeros((1, ctx), jnp.int32)
    pf_iters = max(2, iters // 8)
    pf_pos = jnp.zeros((1,), jnp.int32)

    def make_prefill(stacked_args, b_stacked, cache_dtype):
        @jax.jit
        def chain_prefill(ids, stacked_, rest_, b_arrays):
            def it(ids, _):
                cache = make_cache(cfg, 1, ctx, cache_dtype)
                logits, cache = llama_step_scan(
                    {}, ids, cache, pf_pos, cfg,
                    qcfg0 if b_stacked is not None else None,
                    stacked=stacked_, rest=rest_,
                    backend_stacked=None if b_arrays is None else
                    {"arrays": b_arrays, "meta": b_stacked["meta"]},
                    fresh_prefill=True,
                    logits_last_only=True,
                )
                nxt = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
                return ids.at[:, 0].set(nxt), None

            ids, _ = jax.lax.scan(it, ids, None, length=pf_iters)
            return ids

        return chain_prefill

    chain_pf_fused = make_prefill(
        stacked, bs, "mxint8-staged" if on_tpu else "mxint8")
    chain_pf_dense = make_prefill(stacked_dense, None, jnp.bfloat16)

    def pf_fused_fn(ids):
        return chain_pf_fused(ids, stacked, rest, bs["arrays"])

    def pf_dense_fn(ids):
        return chain_pf_dense(ids, stacked_dense, rest, None)

    t_p, t_pd = [], []
    st_f, st_d = pf_ids, pf_ids
    for r in range(repeats):
        t, st_f = _bench(pf_fused_fn, st_f, pf_iters, warmup=(r == 0))
        t_p.append(t * scale)
        t, st_d = _bench(pf_dense_fn, st_d, pf_iters, warmup=(r == 0))
        t_pd.append(t * scale)
    t_prefill, t_prefill_d = min(t_p), min(t_pd)
    prefill_tok_s = ctx / t_prefill

    # MFU: measured vs the chip's bf16 matmul peak for the flops a dense
    # prefill of this chunk must do (linears + causal attention + head)
    h_, inter_, kv_ = cfg.hidden_size, cfg.intermediate_size, \
        cfg.kv_heads * cfg.head_dim
    lin_flops = 2 * ctx * (h_ * (h_ + 2 * kv_) + h_ * h_
                           + 2 * h_ * inter_ + inter_ * h_)
    attn_flops = 2 * 2 * cfg.num_attention_heads * ctx * ctx \
        * cfg.head_dim // 2  # QK^T + P·V, causal half
    head_flops = 2 * 1 * h_ * cfg.vocab_size  # last-position-only head
    pf_flops = (lin_flops + attn_flops) * layers * scale + head_flops
    TPU_PEAK = 197e12  # v5e bf16
    prefill_mfu = (pf_flops / t_prefill) / TPU_PEAK if on_tpu else 0.0
    print(f"[bench] prefill {ctx}-token chunk: {t_prefill*1e3:.1f} ms "
          f"({prefill_tok_s:.0f} tok/s at 32 layers) "
          f"MFU={prefill_mfu:.2f} dense={t_prefill_d*1e3:.1f} ms "
          f"(vs_dense {t_prefill_d/t_prefill:.2f})", file=sys.stderr)

    # ---- speed-of-light accounting (per full 32-layer step) ---------------
    h, inter, kv = cfg.hidden_size, cfg.intermediate_size, \
        cfg.kv_heads * cfg.head_dim
    # qkv (q: h, k/v: kv each), o, gate|up, down
    lin_shapes = [(h + 2 * kv, h), (h, h), (2 * inter, h), (h, inter)]
    w4 = sum(o * i // 2 + o * i // 16 for o, i in lin_shapes)
    ab = sum((i * RANK + RANK * o) * 2 for o, i in lin_shapes)
    kv_read_q = 2 * slots * cfg.kv_heads * ctx * cfg.head_dim * 17 // 16
    head_w8 = cfg.vocab_size * h * 17 // 16   # packed W8 lm_head, per step
    head_bf16 = cfg.vocab_size * h * 2
    fused_bytes = (w4 + ab + kv_read_q) * layers * scale + head_w8
    dense_w = sum(o * i * 2 for o, i in lin_shapes)
    kv_read_d = 2 * slots * cfg.kv_heads * ctx * cfg.head_dim * 2
    dense_bytes = (dense_w + kv_read_d) * layers * scale + head_bf16
    sol = fused_bytes / HBM_BW
    frac = sol / t_fused if on_tpu else 0.0

    print(
        f"[bench] backend={jax.default_backend()} FULL-STEP "
        f"fused={t_fused*1e3:.2f}ms dense={t_dense*1e3:.2f}ms "
        f"dense+fp-kernel={t_dense_k*1e3:.2f}ms "
        f"(min of {repeats}; fused spread "
        f"{min(t_f)*1e3:.2f}-{max(t_f)*1e3:.2f}ms) "
        f"stream={fused_bytes/1e9:.2f}GB/step (dense {dense_bytes/1e9:.1f}) "
        f"SoL={sol*1e3:.2f}ms frac_of_SoL={frac:.2f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "llama7b_w4a8_lqer_full_decode_step_tokens_per_s_per_chip",
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(ratio, 3),
        "step_ms": round(t_fused * 1e3, 2),
        "dense_step_ms": round(t_dense * 1e3, 2),
        "frac_of_sol": round(frac, 3),
        "ctx": ctx,
        "batch": slots,
        "prefill_tokens_per_s": round(prefill_tok_s, 0),
        "prefill_chunk_ms": round(t_prefill * 1e3, 2),
        "prefill_mfu": round(prefill_mfu, 3),
        "prefill_dense_chunk_ms": round(t_prefill_d * 1e3, 2),
        "prefill_vs_dense": round(t_prefill_d / t_prefill, 3),
        # strongest constructible baseline: dense XLA linears + this
        # framework's fp decode-attention kernel (LQER_FP_ATTN_KERNEL)
        "dense_kernel_step_ms": round(t_dense_k * 1e3, 2),
        "vs_best_baseline": round(t_dense_k / t_fused, 3),
    }))


if __name__ == "__main__":
    main()
