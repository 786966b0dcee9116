#!/usr/bin/env python
"""Where do the decode linears lose ~220 us/layer vs the Pallas fetch
ceiling? Chain the REAL three per-layer kernels (qkv / o_proj / mlp_fused,
layer-indexed stacked operands — exactly the scan body's calls) with and
without the XLA glue between them:

  k3        — kernels only, outputs feed forward as bf16
  k3_glue   — + the serving glue: rms_norm + x-quantize before qkv and mlp,
              quantize before o (what the scan body actually runs)
  k3_rot    — k3_glue + rotary embedding application on q/k heads

Marginal ms/step between short/long chains; 32-layer extrapolation.
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--iters", nargs="+", type=int, default=[8, 24])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cases", nargs="+",
                    default=["k0", "k3", "k3_glue", "k3_rot"])
    args = ap.parse_args()

    import dataclasses

    from lqer_tpu import models
    from lqer_tpu.models import LlamaConfig, llama as llama_mod
    from lqer_tpu.models.common import rms_norm
    from lqer_tpu.serving import decode as dec
    from experiments.bench_e2e_llama7b import build_7b_backend_and_params

    RANK, SLOTS = 32, 8
    cfg = dataclasses.replace(LlamaConfig.llama_7b(),
                              num_hidden_layers=args.layers)
    backend, params, qcfgs = build_7b_backend_and_params(cfg, RANK)
    bs = dec.stack_backend(backend, cfg)
    b_meta, b_arrays = bs["meta"], bs["arrays"]
    q0 = qcfgs[0]
    attn_cfg = q0["attn"]
    NL = cfg.num_hidden_layers
    h0 = jax.random.normal(jax.random.PRNGKey(1),
                           (SLOTS, 1, cfg.hidden_size), jnp.float32)
    ln_w = jnp.ones((NL, cfg.hidden_size), jnp.float32)
    cos, sin = llama_mod.rotary_tables(cfg.head_dim, 2048, cfg.rope_theta)
    positions = jnp.full((SLOTS,), 1000, jnp.int32)
    q_abs = positions[:, None]

    def layer(case, h, li, lnw, b_arrays):
        from lqer_tpu.serving.decode import _heads, _lin_group_slice, \
            _mlp_fused_or_none
        from lqer_tpu.models.common import merge_heads

        if case == "k0":
            # raw kernel launches on pre-"quantized" bf16 inputs: no
            # x-quantizers, no norms — the pure kernel in-situ rate
            from lqer_tpu.ops.pallas.dequant_gemm import qlinear_w4_fused
            from lqer_tpu.ops.pallas.mlp_fused import mlp_w4_fused

            x2 = h[:, 0, :].astype(jnp.bfloat16)
            mq = b_meta["self_attn.qkv_proj"]
            y = qlinear_w4_fused(
                x2, {**b_arrays["self_attn.qkv_proj"], **mq},
                quant_xa_width=mq["xa_width"],
                quant_out_width=mq["out_width"], layer_index=li)
            mo = b_meta["self_attn.o_proj"]
            o = qlinear_w4_fused(
                y[:, :cfg.hidden_size].astype(jnp.bfloat16),
                {**b_arrays["self_attn.o_proj"], **mo},
                quant_xa_width=mo["xa_width"],
                quant_out_width=mo["out_width"], layer_index=li)
            mm = b_meta["mlp_fused"]
            z = mlp_w4_fused(
                o.astype(jnp.bfloat16),
                {**b_arrays["mlp_fused"], **mm},
                tile_i=mm["tile_i"], tile_n=mm["tile_n"],
                act_width=mm["act_width"], quant_xa_width=mm["xa_width"],
                quant_out_width=mm["out_width"], layer_index=li)
            return h + z[:, None, :]
        if case == "k3":
            hn = h
        else:
            hn = rms_norm(h, {"weight": lnw, "bias": None}, cfg.rms_norm_eps)
        qy, ky, vy = _lin_group_slice(
            hn, None, "self_attn.qkv_proj",
            ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
            (attn_cfg.q_proj, attn_cfg.k_proj, attn_cfg.v_proj),
            b_meta, b_arrays, layer_index=li)
        if case == "k3_rot":
            qh = _heads(qy, cfg.num_attention_heads)
            kh = _heads(ky, cfg.kv_heads)
            qh, kh = llama_mod.apply_rotary(qh, kh, cos, sin, q_abs)
            attn_in = merge_heads(qh) + merge_heads(kh) * 1e-6
        else:
            attn_in = qy + ky * 1e-6 + vy * 1e-6
        o = dec._lin_slice(attn_in, None, "self_attn.o_proj",
                           attn_cfg.o_proj, b_meta, b_arrays, layer_index=li)
        h = h + o
        if case == "k3":
            hn2 = h
        else:
            hn2 = rms_norm(h, {"weight": lnw, "bias": None},
                           cfg.rms_norm_eps)
        y = _mlp_fused_or_none(hn2, None, q0["gate_proj"], q0["down_proj"],
                               None, backend_meta=b_meta,
                               backend_slice=b_arrays, layer_index=li)
        assert y is not None
        return h + y

    def make_chain(case, iters):
        @jax.jit
        def chain(h, b_arrays_, ln):
            def it(h, _):
                def body(carry, xs):
                    hh = carry
                    lnw, li = xs
                    return layer(case, hh, li, lnw, b_arrays_), None

                hh, _ = jax.lax.scan(
                    body, h,
                    (ln, jnp.arange(NL, dtype=jnp.int32)[:, None]))
                return hh / (1.0 + jnp.max(jnp.abs(hh))), None

            h, _ = jax.lax.scan(it, h, None, length=iters)
            return h

        return chain

    for case in args.cases:
        res = {}
        for iters in args.iters:
            chain = make_chain(case, iters)
            ts = []
            for r in range(args.repeats + 1):
                t0 = time.perf_counter()
                out = chain(h0, b_arrays, ln_w)
                jax.device_get(out)
                if r:
                    ts.append(time.perf_counter() - t0)
            res[iters] = min(ts)
        its = sorted(res)
        marg = (res[its[-1]] - res[its[0]]) / (its[-1] - its[0])
        print(f"{case:8s} {marg*1e3:7.2f} ms/step at {args.layers} layers "
              f"-> {marg*1e3*32/args.layers:7.2f} ms at 32 "
              f"({marg/args.layers*1e6:6.1f} us/layer)", flush=True)


if __name__ == "__main__":
    main()
