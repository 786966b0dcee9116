#!/usr/bin/env python
"""Price the decode-attention side of the full decode step on the real TPU.

bench.py (round 3) showed the FULL fused step at ~105 ms vs dense ~62 ms —
the linears-only step measured ~19 ms in round 2, so attention over the
2048-token cache is the dominant (and regressing) term. This probe times the
attention sub-step in isolation, layer-indexed over a stacked cache exactly
as `serving.decode.llama_step_scan` runs it, for variants that ablate each
candidate cost:

  qfull   — decode_attention_quantized, all widths 8 (the serving config)
  qnoreq  — same kernel, q/k/p/v re-quantization OFF (prices the in-kernel
            shared-exponent requant chains: log2/exp2/round over (L,d))
  qnodec  — requant off AND cache decode collapsed to a plain int8→f32 cast
            (prices the exp2+group-multiply decode of the MXINT8 cache)
  xla     — eager bf16 attention over a stacked bf16 cache via
            dynamic_index_in_dim + einsum (what the dense baseline runs)
  write   — cache write only (`_cache_write_full`): mx8 encode + per-slot
            DUS into the full stacked cache, attention skipped
  fetch   — pure cache-fetch lower bound (pallas reduce of codes+exps)

Methodology matches bench.py: LAYERS distinct stacked layers scanned inside
ONE dispatch, ITERS step-chain in the same dispatch, VALUE-fetch drain,
min-over-repeats of the chain average.
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from lqer_tpu.ops.pallas.decode_attention import (  # noqa: E402
    decode_attention_quantized,
)
from lqer_tpu.parallel.collectives import mx8_decode, mx8_encode  # noqa: E402


def _bench(fn, state0, iters):
    state0 = fn(state0)
    jax.device_get(jax.tree_util.tree_leaves(state0)[0])
    t0 = time.perf_counter()
    state = fn(state0)
    jax.device_get(jax.tree_util.tree_leaves(state)[0])
    return (time.perf_counter() - t0) / iters, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cases", nargs="+", default=[
        "qfull", "qnoreq", "xla", "write", "fetch"])
    ap.add_argument("--vmem-budget", type=int, default=0,
                    help="override _kvh_chunk VMEM budget (bytes)")
    args = ap.parse_args()
    if args.vmem_budget:
        import functools as _ft
        from lqer_tpu.ops.pallas import decode_attention as _da
        _orig = _da._kvh_chunk
        _da._kvh_chunk = _ft.partial(_orig, budget=args.vmem_budget)

    NL, B, KVH, L, d = args.layers, args.batch, 32, args.ctx, 128
    H, g = 32, 16
    key = jax.random.PRNGKey(0)
    if L * NL <= 8 * 2048:
        kf = jax.random.normal(key, (NL, B, KVH, L, d), jnp.float32)
        k_c, k_e = mx8_encode(kf, g)
    else:
        # long-ctx: build codes directly (an f32 source + int32
        # intermediates would OOM the 16 GB HBM at 32K ctx)
        k_c = jax.random.randint(key, (NL, B, KVH, L, d), -127, 128,
                                 jnp.int8)
        k_e = jax.random.randint(jax.random.PRNGKey(2),
                                 (NL, B, KVH, L, d // g), -3, 3, jnp.int8)
    # distinct bytes, same stats (clip avoids int8 wraparound at 127)
    v_c, v_e = jnp.clip(k_c.astype(jnp.int32) + 1, -127, 127).astype(jnp.int8), k_e
    # codes AND exps stored transposed (token axis last) — kv_cache layout
    cache = {"k_codes": jnp.swapaxes(k_c, -1, -2),
             "k_exps": jnp.swapaxes(k_e, -1, -2),
             "v_codes": jnp.swapaxes(v_c, -1, -2),
             "v_exps": jnp.swapaxes(v_e, -1, -2)}
    cache_bf = None
    if "xla" in args.cases:  # 2x bf16 cache — OOM at 32K ctx, build lazily
        cache_bf = {"k": mx8_decode(k_c, k_e, g, jnp.bfloat16),
                    "v": mx8_decode(v_c, v_e, g, jnp.bfloat16)}
    positions = jnp.full((B,), L - 2, jnp.int32)
    q0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, 1, d), jnp.float32)
    scaling = d ** -0.5

    qbytes = 2 * B * KVH * L * (d + d // g) * NL
    fbytes = 2 * B * KVH * L * d * 2 * NL

    def fold(o, q):
        # fold attention output back into q so each layer depends on the last
        return q + 1e-6 * o.astype(q.dtype)

    def make_chain(per_layer):
        """per_layer(q, li, kv) -> attention out. ``kv`` (the cache pytree)
        is a jit ARGUMENT — closing over it would inline the multi-GB cache
        as HLO constants and blow the remote-compile relay's request-size
        limit (HTTP 413; same rule as the engine's params-as-args)."""

        @jax.jit
        def chain(q, kv):
            def body(q, li):
                return fold(per_layer(q, li, kv), q), None

            def it(q, _):
                q, _ = jax.lax.scan(
                    body, q, jnp.arange(NL, dtype=jnp.int32)[:, None])
                return q, None

            q, _ = jax.lax.scan(it, q, None, length=args.iters)
            return q

        return chain

    for case in args.cases:
        try:
            if case == "qstream":
                # two-pass chunked-L kernel (L beyond VMEM residency)
                from lqer_tpu.ops.pallas.decode_attention import (
                    decode_attention_quantized_streaming,
                )

                kw = dict(scaling=scaling, q_width=8, p_width=8,
                          l_chunk=2048, interpret=False)

                def per_layer(q, li, kv, kw=kw):
                    return decode_attention_quantized_streaming(
                        q, kv["k_codes"], kv["k_exps"],
                        kv["v_codes"], kv["v_exps"], positions,
                        layer_index=li, **kw)

                chain, chain_kv = make_chain(per_layer), cache
                total = 3 * qbytes // 2  # K read twice
            elif case in ("qfull", "qnoreq"):
                # round 4: quantize-once-at-write — no k/v use-time widths.
                # qnoreq now ablates only the remaining q/p quantization.
                w = 8 if case == "qfull" else None
                kw = dict(scaling=scaling, q_width=w, p_width=w,
                          interpret=False)

                def per_layer(q, li, kv, kw=kw):
                    return decode_attention_quantized(
                        q, kv["k_codes"], kv["k_exps"],
                        kv["v_codes"], kv["v_exps"], positions,
                        layer_index=li, **kw)

                chain, chain_kv = make_chain(per_layer), cache
                total = qbytes
            elif case == "xla":
                def per_layer(q, li, kc):
                    k_l = jax.lax.dynamic_index_in_dim(kc["k"], li[0], 0,
                                                       keepdims=False)
                    v_l = jax.lax.dynamic_index_in_dim(kc["v"], li[0], 0,
                                                       keepdims=False)
                    s = jnp.einsum("bhsd,bkld->bhsl", q,
                                   k_l.astype(jnp.float32)) * scaling
                    mask = (jnp.arange(L) <= positions[:, None])[
                        :, None, None, :]
                    s = jnp.where(mask, s, -jnp.inf)
                    p = jax.nn.softmax(s, axis=-1)
                    return jnp.einsum("bhsl,bkld->bhsd", p,
                                      v_l.astype(jnp.float32))

                chain, chain_kv = make_chain(per_layer), cache_bf
                total = fbytes
            elif case == "write":
                from lqer_tpu.serving.decode import _cache_write_full

                @jax.jit
                def chain(state):
                    q, cache = state

                    def it(st, _):
                        q, cache = st

                        def body(c, li):
                            q, cache = c
                            kh = q[:, :KVH, :, :]        # (B, KVH, 1, d)
                            cache = _cache_write_full(
                                cache, li[0], kh, kh, positions)
                            return (q + 1e-6, cache), None

                        (q, cache), _ = jax.lax.scan(
                            body, (q, cache),
                            jnp.arange(NL, dtype=jnp.int32)[:, None])
                        return (q, cache), None

                    st, _ = jax.lax.scan(it, (q, cache), None,
                                         length=args.iters)
                    return st

                total = 0
            elif case in ("wenc", "wkern"):
                # split of `write`: wenc = mx8_encode+swapaxes of the new
                # rows only; wkern = write_kv_rows_stacked only (pre-encoded
                # news, encode outside the chain).
                from lqer_tpu.parallel.collectives import mx8_encode as enc
                from lqer_tpu.ops.pallas.cache_write import (
                    write_kv_rows_stacked,
                )

                kh0 = q0[:, :KVH, :, :]
                kc0, ke0 = enc(kh0, g)
                news0 = (jnp.swapaxes(kc0, -1, -2),
                         jnp.swapaxes(ke0, -1, -2))

                if case == "wenc":
                    def per_layer(q, li, kv):
                        kh = q[:, :KVH, :, :]
                        k_c, k_e = enc(kh, g)
                        out = (jnp.swapaxes(k_c, -1, -2).astype(jnp.float32)
                               .sum() + jnp.swapaxes(k_e, -1, -2)
                               .astype(jnp.float32).sum())
                        return jnp.broadcast_to(
                            out * 1e-20, (B, H, 1, d)).astype(jnp.float32)

                    chain, chain_kv = make_chain(per_layer), cache
                    total = 0
                else:
                    @jax.jit
                    def chain(state):
                        q, cache = state

                        def it(st, _):
                            q, cache = st

                            def body(c, li):
                                q, cache = c
                                keys = sorted(
                                    k for k in cache if k.endswith("codes")
                                    or k.endswith("exps"))
                                upd = write_kv_rows_stacked(
                                    tuple(cache[k] for k in keys),
                                    (news0[0], news0[1], news0[0], news0[1]),
                                    li[0], positions)
                                cache = dict(zip(keys, upd))
                                return (q + 1e-6, cache), None

                            (q, cache), _ = jax.lax.scan(
                                body, (q, cache),
                                jnp.arange(NL, dtype=jnp.int32)[:, None])
                            return (q, cache), None

                        st, _ = jax.lax.scan(it, (q, cache), None,
                                             length=args.iters)
                        return st

                    total = 0
            elif case == "wbatch":
                # ONE write kernel per step covering all NL layers
                # (grid (NL, B)) — the deferred-write design's cost.
                from lqer_tpu.parallel.collectives import mx8_encode as enc
                from lqer_tpu.ops.pallas.cache_write import (
                    write_kv_rows_all_layers,
                )

                kh0 = q0[:, None, :KVH, :, :]            # (B, 1, KVH, 1, d)
                kc0, ke0 = enc(jnp.broadcast_to(
                    kh0, (B, NL, KVH, 1, d)), g)
                news0 = (jnp.swapaxes(kc0, -1, -2).swapaxes(0, 1),
                         jnp.swapaxes(ke0, -1, -2).swapaxes(0, 1))

                @jax.jit
                def chain(state):
                    q, cache = state

                    def it(st, _):
                        q, cache = st
                        keys = sorted(
                            k for k in cache if k.endswith("codes")
                            or k.endswith("exps"))
                        upd = write_kv_rows_all_layers(
                            tuple(cache[k] for k in keys),
                            (news0[0], news0[1], news0[0], news0[1]),
                            positions)
                        cache = dict(zip(keys, upd))
                        return (q + 1e-6, cache), None

                    st, _ = jax.lax.scan(it, (q, cache), None,
                                         length=args.iters)
                    return st

                total = 0
            elif case == "fetch":
                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu

                def fk(idx_ref, kc, ke, vc, ve, o_ref):
                    b = pl.program_id(0)

                    @pl.when(b == 0)
                    def _():
                        o_ref[...] = jnp.zeros_like(o_ref)

                    acc = (jnp.sum(kc[...].astype(jnp.float32))
                           + jnp.sum(ke[...].astype(jnp.float32))
                           + jnp.sum(vc[...].astype(jnp.float32))
                           + jnp.sum(ve[...].astype(jnp.float32)))
                    o_ref[...] = o_ref[...] + acc

                spec_c = pl.BlockSpec((None, 1, 4, d, L),
                                      lambda b, g_, idx: (idx[0], b, g_, 0, 0),
                                      memory_space=pltpu.VMEM)
                spec_e = pl.BlockSpec((None, 1, 4, d // g, L),
                                      lambda b, g_, idx: (idx[0], b, g_, 0, 0),
                                      memory_space=pltpu.VMEM)

                def per_layer(q, li, kv):
                    r = pl.pallas_call(
                        fk,
                        grid_spec=pltpu.PrefetchScalarGridSpec(
                            num_scalar_prefetch=1,
                            grid=(B, KVH // 4),
                            in_specs=[spec_c, spec_e, spec_c, spec_e],
                            out_specs=pl.BlockSpec(
                                (8, 128), lambda b, g_, idx: (0, 0),
                                memory_space=pltpu.VMEM),
                        ),
                        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    )(li, kv["k_codes"], kv["k_exps"],
                      kv["v_codes"], kv["v_exps"])
                    return jnp.broadcast_to(
                        r[0, 0] * 1e-20, (B, H, 1, d)).astype(jnp.float32)

                chain, chain_kv = make_chain(per_layer), cache
                total = qbytes

            times = []
            if case in ("write", "wkern", "wbatch"):
                state = (q0, cache)
                for _ in range(args.repeats):
                    t, state = _bench(chain, state, args.iters)
                    times.append(t)
            else:
                q = q0
                for _ in range(args.repeats):
                    t, q = _bench(lambda qq: chain(qq, chain_kv), q,
                                  args.iters)
                    times.append(t)
            t = min(times)
            bw = total / t / 1e9 if total else 0.0
            print(f"{case:8s} {t*1e3/NL:8.3f} ms/layer  {t*1e3:8.2f} ms/step"
                  f"  {bw:7.1f} GB/s")
        except Exception as e:  # noqa: BLE001
            print(f"{case:8s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
