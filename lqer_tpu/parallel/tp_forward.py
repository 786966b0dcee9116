"""Explicit tensor-parallel forward with quantized collectives on the wire.

The GSPMD path (`parallel/step.py` + `sharding.py`) lets XLA insert bf16/f32
collectives from NamedSharding annotations. This module is the hand-scheduled
alternative: the decoder runs under `shard_map` with Megatron layouts
(matching `sharding.py`'s rules exactly), and the two row-parallel reductions
per layer — the dominant ICI traffic, one (b,s,hidden) tensor after o_proj
and one after down_proj — ride `quantized_psum_scatter` +
`quantized_all_gather` (`collectives.py`): MXINT8 codes + per-16-group int8
exponents, ~2.1x fewer wire bytes than a bf16 all-reduce.

This is the EQuARX-style capability PAPERS.md describes and the reference
cannot express (it has no communication backend, SURVEY.md §2.9). Numerics:
with ``quantized_collectives=False`` the step is the exact TP computation
(plain psum); with ``True`` each reduction hop adds one MXINT8 quantization
of the partial sums — the documented wire-precision trade-off.

Scope: Llama/Mistral decoders (the flagship serving family) and OPT
(pre/post-LN, learned positions, query pre-scale, ReLU MLP — the reference's
`opt_decoder.py` semantics). Requires ``num_attention_heads % tp == 0``,
``kv_heads % tp == 0``, and the usual feature-dim divisibility;
`make_tp_forward` raises otherwise (OPT-350m's project_in/out is not TP'd).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import models
from ..models.common import (
    apply_rotary,
    causal_mask,
    eager_attention,
    layer_norm,
    merge_heads,
    rms_norm,
    rotary_tables,
)
from .collectives import quantized_all_gather, quantized_psum_scatter
from .sharding import spec_for_param, _clip_spec


def _reduce_row_parallel(y_partial, quantized: bool, group: int = 16):
    """Reduce partial sums of a row-parallel linear across the tp axis,
    returning the replicated result. Quantized: ring reduce-scatter +
    all-gather with MXINT8 payloads; else one psum."""
    if not quantized:
        return jax.lax.psum(y_partial, "tp")
    b, s, f = y_partial.shape
    flat = y_partial.reshape(b * s, f)
    # scatter/gather along features: per-device chunk f/tp stays 16-aligned
    red = quantized_psum_scatter(flat, "tp", scatter_axis=1, group=group)
    out = quantized_all_gather(red, "tp", gather_axis=1, group=group,
                               dtype=y_partial.dtype)
    return out.reshape(b, s, f)


def make_tp_forward(
    cfg,
    layer_qcfgs,
    mesh: Mesh,
    *,
    quantized_collectives: bool = True,
    group: int = 16,
):
    """Build ``fwd(params, input_ids) -> logits`` running the quantized
    decoder under shard_map with explicit (quantized) TP collectives.

    ``params`` must be sharded by `shard_params` (or at least globally shaped
    — shard_map will split per `sharding.py`'s specs).
    """
    is_opt = getattr(cfg, "arch", None) == "opt"
    if not is_opt and cfg.arch not in ("llama", "mistral"):
        raise NotImplementedError(f"tp_forward does not cover arch {cfg.arch}")
    if is_opt and cfg.embed_dim != cfg.hidden_size:
        raise NotImplementedError(
            "OPT-350m project_in/out is not tensor-parallelized"
        )
    tp = mesh.shape["tp"]
    heads = cfg.num_attention_heads
    kv = heads if is_opt else cfg.kv_heads
    inter = cfg.ffn_dim if is_opt else cfg.intermediate_size
    if heads % tp or kv % tp or cfg.hidden_size % (tp * 16) or \
            inter % (tp * 16) or cfg.vocab_size % tp:
        raise ValueError(
            f"model dims not divisible for tp={tp}: heads={heads} kv={kv} "
            f"hidden={cfg.hidden_size} inter={inter} "
            f"vocab={cfg.vocab_size}"
        )
    heads_l, kv_l = heads // tp, kv // tp
    n_rep = heads // kv
    vocab_l = cfg.vocab_size // tp

    def q(i):
        from ..models.fp_config import FP_LAYER_LLAMA, FP_LAYER_OPT

        if layer_qcfgs is not None:
            return layer_qcfgs[i]
        return FP_LAYER_OPT if is_opt else FP_LAYER_LLAMA

    def col_linear(x, w, b, a, bb, qc):
        """Column-parallel: x replicated, w (out/tp, in) local; returns the
        locally-sharded output. A replicated, B (r, out/tp) local."""
        x_q = qc.x_quantizer(x)
        y = jnp.matmul(x_q, w.T)
        if b is not None:
            y = y + b
        if qc.is_lqer and a is not None:
            xa = qc.a_out_quantizer(jnp.matmul(x_q, a))
            y = y + qc.b_out_quantizer(jnp.matmul(xa, bb))
        return y

    def row_linear(x_loc, w, b, a, bb, qc):
        """Row-parallel: x feature-sharded, w (out, in/tp) local; returns the
        REPLICATED output. A (in/tp, r) local, B replicated — xA partials
        psum at f32 (tiny), main partials through the quantized reduction."""
        x_q = qc.x_quantizer(x_loc)
        y_part = jnp.matmul(x_q, w.T)
        y = _reduce_row_parallel(y_part, quantized_collectives, group)
        if b is not None:
            y = y + b
        if qc.is_lqer and a is not None:
            xa = jax.lax.psum(jnp.matmul(x_q, a), "tp")  # (b,s,rank): tiny
            corr = qc.b_out_quantizer(
                jnp.matmul(qc.a_out_quantizer(xa), bb))
            y = y + corr
        return y

    def body(params, input_ids):
        def mod(prefix):
            return (params.get(prefix + ".weight"),
                    params.get(prefix + ".bias"),
                    params.get(prefix + ".A"),
                    params.get(prefix + ".B"))

        b, s = input_ids.shape
        # vocab-sharded embedding lookup: masked local take + psum
        embed_l = params["model.embed_tokens.weight"]  # (V/tp, h)
        h = _sharded_embed_lookup(embed_l, input_ids)

        cos, sin = rotary_tables(
            cfg.head_dim, max(s, cfg.max_position_embeddings), cfg.rope_theta)
        positions = jnp.arange(s)
        mask = causal_mask(s, dtype=h.dtype)

        for i in range(cfg.num_hidden_layers):
            p = f"model.layers.{i}"
            lq = q(i)
            attn_cfg = lq["attn"]

            residual = h
            hn = rms_norm(h, {"weight": params[f"{p}.input_layernorm.weight"]},
                          cfg.rms_norm_eps)

            def heads_of(y, n):
                return y.reshape(b, s, n, -1).transpose(0, 2, 1, 3)

            qh = heads_of(col_linear(hn, *mod(f"{p}.self_attn.q_proj"),
                                     attn_cfg.q_proj), heads_l)
            kh = heads_of(col_linear(hn, *mod(f"{p}.self_attn.k_proj"),
                                     attn_cfg.k_proj), kv_l)
            vh = heads_of(col_linear(hn, *mod(f"{p}.self_attn.v_proj"),
                                     attn_cfg.v_proj), kv_l)
            qh, kh = apply_rotary(qh, kh, cos, sin, positions)
            if n_rep > 1:
                kh = jnp.repeat(kh, n_rep, axis=1)
                vh = jnp.repeat(vh, n_rep, axis=1)
            attn = eager_attention(
                qh, kh, vh, mask, attn_cfg.qk_matmul, attn_cfg.pv_matmul,
                scaling=cfg.head_dim ** -0.5, scale_query=False,
            )
            attn = row_linear(merge_heads(attn),
                              *mod(f"{p}.self_attn.o_proj"), attn_cfg.o_proj)
            h = residual + attn

            residual = h
            hn = rms_norm(
                h, {"weight": params[f"{p}.post_attention_layernorm.weight"]},
                cfg.rms_norm_eps)
            gate = col_linear(hn, *mod(f"{p}.mlp.gate_proj"), lq["gate_proj"])
            up = col_linear(hn, *mod(f"{p}.mlp.up_proj"), lq["up_proj"])
            h = residual + row_linear(jax.nn.silu(gate) * up,
                                      *mod(f"{p}.mlp.down_proj"),
                                      lq["down_proj"])

        h = rms_norm(h, {"weight": params["model.norm.weight"]},
                     cfg.rms_norm_eps)
        lm_head = params.get("lm_head.weight",
                             params["model.embed_tokens.weight"])
        logits_l = jnp.matmul(h, lm_head.T)  # (b, s, V/tp)
        return jax.lax.all_gather(logits_l, "tp", axis=2, tiled=True)

    def _sharded_embed_lookup(embed_l, input_ids):
        """Vocab-sharded embedding: masked local take + psum."""
        offset = jax.lax.axis_index("tp") * vocab_l
        local_ids = jnp.clip(input_ids - offset, 0, vocab_l - 1)
        h = jnp.take(embed_l, local_ids, axis=0)
        in_shard = ((input_ids >= offset) & (input_ids < offset + vocab_l))
        h = jnp.where(in_shard[..., None], h, 0.0)
        return jax.lax.psum(h, "tp")

    def body_opt(params, input_ids):
        """OPT decoder under TP (`/root/reference/src/lqer/models/
        opt_decoder.py:212-322` semantics: learned positions offset 2, query
        pre-scale, pre/post-LN, ReLU MLP, biases on every linear)."""
        def mod(prefix):
            return (params.get(prefix + ".weight"),
                    params.get(prefix + ".bias"),
                    params.get(prefix + ".A"),
                    params.get(prefix + ".B"))

        b, s = input_ids.shape
        embed_l = params["model.decoder.embed_tokens.weight"]  # (V/tp, h)
        h = _sharded_embed_lookup(embed_l, input_ids)
        positions = jnp.arange(s) + 2  # OPTLearnedPositionalEmbedding offset
        h = h + jnp.take(params["model.decoder.embed_positions.weight"],
                         positions, axis=0)
        mask = causal_mask(s, dtype=h.dtype)

        for i in range(cfg.num_hidden_layers):
            p = f"model.decoder.layers.{i}"
            lq = q(i)
            attn_cfg = lq["attn"]

            residual = h
            if cfg.do_layer_norm_before:
                h = layer_norm(
                    h, {"weight": params[f"{p}.self_attn_layer_norm.weight"],
                        "bias": params[f"{p}.self_attn_layer_norm.bias"]})

            def heads_of(y, n):
                return y.reshape(b, s, n, -1).transpose(0, 2, 1, 3)

            qh = heads_of(col_linear(h, *mod(f"{p}.self_attn.q_proj"),
                                     attn_cfg.q_proj), heads_l)
            kh = heads_of(col_linear(h, *mod(f"{p}.self_attn.k_proj"),
                                     attn_cfg.k_proj), heads_l)
            vh = heads_of(col_linear(h, *mod(f"{p}.self_attn.v_proj"),
                                     attn_cfg.v_proj), heads_l)
            attn = eager_attention(
                qh, kh, vh, mask, attn_cfg.qk_matmul, attn_cfg.pv_matmul,
                scaling=cfg.head_dim ** -0.5, scale_query=True,
            )
            attn = row_linear(merge_heads(attn),
                              *mod(f"{p}.self_attn.out_proj"),
                              attn_cfg.o_proj)
            h = residual + attn
            if not cfg.do_layer_norm_before:
                h = layer_norm(
                    h, {"weight": params[f"{p}.self_attn_layer_norm.weight"],
                        "bias": params[f"{p}.self_attn_layer_norm.bias"]})

            residual = h
            if cfg.do_layer_norm_before:
                h = layer_norm(
                    h, {"weight": params[f"{p}.final_layer_norm.weight"],
                        "bias": params[f"{p}.final_layer_norm.bias"]})
            y = col_linear(h, *mod(f"{p}.fc1"), lq["fc1"])
            y = jax.nn.relu(y)
            h = residual + row_linear(y, *mod(f"{p}.fc2"), lq["fc2"])
            if not cfg.do_layer_norm_before:
                h = layer_norm(
                    h, {"weight": params[f"{p}.final_layer_norm.weight"],
                        "bias": params[f"{p}.final_layer_norm.bias"]})

        if params.get("model.decoder.final_layer_norm.weight") is not None:
            h = layer_norm(
                h, {"weight": params["model.decoder.final_layer_norm.weight"],
                    "bias": params["model.decoder.final_layer_norm.bias"]})
        lm_head = params.get("lm_head.weight", embed_l)
        logits_l = jnp.matmul(h, lm_head.T)  # (b, s, V/tp)
        return jax.lax.all_gather(logits_l, "tp", axis=2, tiled=True)

    def param_specs(params):
        return {
            name: _clip_spec(spec_for_param(name), jnp.ndim(arr))
            for name, arr in params.items()
        }

    body_fn = body_opt if is_opt else body

    @functools.partial(jax.jit, static_argnames=())
    def fwd(params, input_ids):
        specs = param_specs(params)
        return shard_map(
            body_fn, mesh=mesh,
            in_specs=(specs, P("dp", None)),
            out_specs=P("dp", None, None),
            check_vma=False,
        )(params, input_ids)

    return fwd


__all__ = ["make_tp_forward"]
