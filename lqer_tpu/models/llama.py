"""Llama-family decoder (Llama-1/2, Vicuna; Mistral subclasses via config)
as a pure-JAX functional model with quantized ops.

Capability mirror of `/root/reference/src/lqer/models/llama_decoder.py` (512
LoC) and `mistral_decoder.py` (621 LoC). Notes preserved:

* eager attention only — QK^T and P·V route through the quantized matmul
  (``matmul_0``/``matmul_1``); flash/sdpa are rejected by the reference
  (`llama_decoder.py:324-343`, `mistral_decoder.py:28-31`)
* RMSNorm, rotary embeddings (HF convention), SiLU gated MLP
* GQA via ``num_key_value_heads`` (Mistral; Llama uses MHA) with
  `repeat_kv` before the quantized matmuls
* Mistral sliding-window attention expressed in the additive mask

Params are a flat ``{hf_name: array}`` dict (``model.layers.N.self_attn.q_proj.weight``
etc.) matching the reference's weight-name contract (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.qlinear import qlinear
from .common import (
    causal_mask,
    eager_attention,
    fused_quantized_attention,
    merge_heads,
    project_heads,
    repeat_kv,
    rms_norm,
    rotary_tables,
    apply_rotary,
    supports_fused_attention,
)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int | None = None  # None -> MHA
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    sliding_window: int | None = None  # Mistral
    tie_word_embeddings: bool = False
    arch: str = "llama"

    @property
    def kv_heads(self):
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def tiny(vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=None,
             inter=128, max_pos=128, **kw) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=vocab_size, hidden_size=hidden, intermediate_size=inter,
            num_hidden_layers=layers, num_attention_heads=heads,
            num_key_value_heads=kv_heads, max_position_embeddings=max_pos, **kw,
        )

    @staticmethod
    def llama_7b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def mistral_7b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
            max_position_embeddings=4096, rms_norm_eps=1e-5, sliding_window=4096,
            arch="mistral",
        )


def layer_prefix(i: int) -> str:
    return f"model.layers.{i}"


def _mod(params: dict, prefix: str) -> dict:
    return {
        "weight": params.get(prefix + ".weight"),
        "bias": params.get(prefix + ".bias"),
        "A": params.get(prefix + ".A"),
        "B": params.get(prefix + ".B"),
    }


def init_params(cfg: LlamaConfig, key, dtype=jnp.float32) -> dict:
    params = {}
    k_iter = iter(jax.random.split(key, 4 + cfg.num_hidden_layers * 8))

    def randn(shape, scale=0.02):
        return (jax.random.normal(next(k_iter), shape) * scale).astype(dtype)

    h, inter = cfg.hidden_size, cfg.intermediate_size
    kv_dim = cfg.kv_heads * cfg.head_dim
    params["model.embed_tokens.weight"] = randn((cfg.vocab_size, h))
    params["model.norm.weight"] = jnp.ones((h,), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head.weight"] = randn((cfg.vocab_size, h))
    for i in range(cfg.num_hidden_layers):
        p = layer_prefix(i)
        params[f"{p}.self_attn.q_proj.weight"] = randn((h, h))
        params[f"{p}.self_attn.k_proj.weight"] = randn((kv_dim, h))
        params[f"{p}.self_attn.v_proj.weight"] = randn((kv_dim, h))
        params[f"{p}.self_attn.o_proj.weight"] = randn((h, h))
        params[f"{p}.mlp.gate_proj.weight"] = randn((inter, h))
        params[f"{p}.mlp.up_proj.weight"] = randn((inter, h))
        params[f"{p}.mlp.down_proj.weight"] = randn((h, inter))
        params[f"{p}.input_layernorm.weight"] = jnp.ones((h,), dtype)
        params[f"{p}.post_attention_layernorm.weight"] = jnp.ones((h,), dtype)
    return params


def _sliding_window_mask(s: int, window: int, dtype) -> jnp.ndarray:
    q_idx = jnp.arange(s)[:, None]
    k_idx = jnp.arange(s)[None, :]
    ok = (k_idx <= q_idx) & (k_idx > q_idx - window)
    mask = jnp.where(ok, 0.0, jnp.finfo(dtype).min)
    return mask.astype(dtype)[None, None, :, :]


def decoder_layer(
    h: jnp.ndarray,
    params: dict,
    cfg: LlamaConfig,
    i: int,
    qcfg: dict | None,
    mask: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    positions: jnp.ndarray,
    tap=None,
    fused_attention: bool = False,
    backend: dict | None = None,
) -> jnp.ndarray:
    from .fp_config import FP_LAYER_LLAMA

    q = qcfg if qcfg is not None else FP_LAYER_LLAMA
    tap = tap or (lambda name, x: None)
    p = layer_prefix(i)
    attn_cfg = q["attn"]

    def heads(y, n):
        b, s, _ = y.shape
        return y.reshape(b, s, n, -1).transpose(0, 2, 1, 3)

    residual = h
    h = rms_norm(h, _mod(params, f"{p}.input_layernorm"), cfg.rms_norm_eps)

    for proj in ("q_proj", "k_proj", "v_proj"):
        tap(f"{p}.self_attn.{proj}", h)
    if backend is not None:
        # eval through the Pallas serving kernels (fused qkv / MLP
        # megakernel when packed) — same routers as the serving decode path
        from ..serving.decode import _lin, _lin_group, _mlp_fused_or_none

        qy, ky, vy = _lin_group(
            h, params, p, "self_attn.qkv_proj",
            ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
            (attn_cfg.q_proj, attn_cfg.k_proj, attn_cfg.v_proj), backend,
        )
        qh = heads(qy, cfg.num_attention_heads)
        kh = heads(ky, cfg.kv_heads)
        vh = heads(vy, cfg.kv_heads)
    else:
        qh = project_heads(h, _mod(params, f"{p}.self_attn.q_proj"),
                           attn_cfg.q_proj, cfg.num_attention_heads)
        kh = project_heads(h, _mod(params, f"{p}.self_attn.k_proj"),
                           attn_cfg.k_proj, cfg.kv_heads)
        vh = project_heads(h, _mod(params, f"{p}.self_attn.v_proj"),
                           attn_cfg.v_proj, cfg.kv_heads)
    qh, kh = apply_rotary(qh, kh, cos, sin, positions)
    n_rep = cfg.num_attention_heads // cfg.kv_heads
    kh = repeat_kv(kh, n_rep)
    vh = repeat_kv(vh, n_rep)

    if fused_attention:
        attn = fused_quantized_attention(
            qh, kh, vh, attn_cfg, scaling=cfg.head_dim**-0.5,
        )
    else:
        attn = eager_attention(
            qh, kh, vh, mask, attn_cfg.qk_matmul, attn_cfg.pv_matmul,
            scaling=cfg.head_dim**-0.5, scale_query=False,
        )
    attn = merge_heads(attn)
    tap(f"{p}.self_attn.o_proj", attn)
    if backend is not None:
        attn = _lin(attn, params, f"{p}.self_attn.o_proj", attn_cfg.o_proj,
                    backend)
    else:
        attn = qlinear(attn, _mod(params, f"{p}.self_attn.o_proj"),
                       attn_cfg.o_proj)
    h = residual + attn

    residual = h
    h = rms_norm(h, _mod(params, f"{p}.post_attention_layernorm"), cfg.rms_norm_eps)
    tap(f"{p}.mlp.gate_proj", h)
    tap(f"{p}.mlp.up_proj", h)
    if backend is not None:
        y = _mlp_fused_or_none(h, p, q["gate_proj"], q["down_proj"], backend)
        if y is None:
            gate, up = _lin_group(
                h, params, p, "mlp.gateup_proj",
                ("mlp.gate_proj", "mlp.up_proj"),
                (q["gate_proj"], q["up_proj"]), backend,
            )
            y = _lin(jax.nn.silu(gate) * up, params, f"{p}.mlp.down_proj",
                     q["down_proj"], backend)
        return residual + y
    gate = qlinear(h, _mod(params, f"{p}.mlp.gate_proj"), q["gate_proj"])
    up = qlinear(h, _mod(params, f"{p}.mlp.up_proj"), q["up_proj"])
    h = jax.nn.silu(gate) * up
    tap(f"{p}.mlp.down_proj", h)
    h = qlinear(h, _mod(params, f"{p}.mlp.down_proj"), q["down_proj"])
    return residual + h


def forward(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: LlamaConfig,
    layer_qcfgs: list[dict] | None = None,
    tap=None,
    fused_attention: bool = False,
    return_hidden: bool = False,
    backend: dict | None = None,
) -> jnp.ndarray:
    b, s = input_ids.shape
    embed = params["model.embed_tokens.weight"]
    h = jnp.take(embed, input_ids, axis=0)

    cos, sin = rotary_tables(cfg.head_dim, max(s, cfg.max_position_embeddings),
                             cfg.rope_theta)
    positions = jnp.arange(s)
    sliding = cfg.sliding_window is not None and s > cfg.sliding_window
    if sliding:
        mask = _sliding_window_mask(s, cfg.sliding_window, h.dtype)
    else:
        mask = causal_mask(s, dtype=h.dtype)

    if fused_attention:
        # eligibility: pure-causal mask + canonical A8 quantization
        ok = (not sliding) and layer_qcfgs is not None and all(
            supports_fused_attention(qc["attn"]) for qc in layer_qcfgs
        )
        if not ok:
            fused_attention = False

    for i in range(cfg.num_hidden_layers):
        qcfg = layer_qcfgs[i] if layer_qcfgs is not None else None
        h = decoder_layer(h, params, cfg, i, qcfg, mask, cos, sin, positions,
                          tap=tap, fused_attention=fused_attention,
                          backend=backend)

    h = rms_norm(h, _mod(params, "model.norm"), cfg.rms_norm_eps)
    if return_hidden:
        return h
    if tap is not None:
        tap("lm_head", h)
    lm_head = params.get("lm_head.weight", embed)
    return jnp.matmul(h, lm_head.T)


# ---------------------------------------------------------------------------
# lax.scan layer loop (compile-time scaling for deep models)
# ---------------------------------------------------------------------------
LAYER_REL_KEYS = (
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
    "input_layernorm", "post_attention_layernorm",
)


def stack_layer_params(params: dict, cfg: LlamaConfig) -> tuple[dict, dict]:
    """Stack per-layer params into leading-axis (L, ...) arrays for lax.scan.

    Requires every layer to carry the same key set (all-or-none A/B). Returns
    (stacked, rest) where ``rest`` holds embeddings/norm/head.
    """
    stacked: dict[str, jnp.ndarray] = {}
    consumed = set()
    for rel in LAYER_REL_KEYS:
        for suffix in ("weight", "bias", "A", "B"):
            name0 = f"{layer_prefix(0)}.{rel}.{suffix}"
            if name0 not in params:
                continue
            per_layer = []
            for i in range(cfg.num_hidden_layers):
                n = f"{layer_prefix(i)}.{rel}.{suffix}"
                assert n in params, f"layer {i} missing {rel}.{suffix}"
                per_layer.append(params[n])
                consumed.add(n)
            stacked[f"{rel}.{suffix}"] = jnp.stack(per_layer)
    rest = {k: v for k, v in params.items() if k not in consumed}
    return stacked, rest


def forward_scan(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: LlamaConfig,
    layer_qcfg: dict | list | None = None,
    stacked: dict | None = None,
    rest: dict | None = None,
) -> jnp.ndarray:
    """`forward` with the layer loop as lax.scan: one trace/compile of the
    decoder layer regardless of depth (TPU-first: the reference's per-layer
    module swap has no analogue of this).

    ``layer_qcfg`` is ONE resolved layer config applied to every layer, or
    the full per-layer list — heterogeneous ``model_layer_{i}`` overrides
    (the reference's mixed-precision surface, `llama_decoder.py:423-482`)
    scan per config segment. Pass precomputed (stacked, rest) to amortize
    the stacking.
    """
    from .config_expand import layer_qcfg_segments
    from .fp_config import FP_LAYER_LLAMA

    if stacked is None or rest is None:
        stacked, rest = stack_layer_params(params, cfg)
    if isinstance(layer_qcfg, (list, tuple)):
        segments = layer_qcfg_segments(list(layer_qcfg), cfg.num_hidden_layers)
    else:
        segments = [(0, cfg.num_hidden_layers,
                     layer_qcfg if layer_qcfg is not None else FP_LAYER_LLAMA)]

    b, s = input_ids.shape
    embed = rest["model.embed_tokens.weight"]
    h = jnp.take(embed, input_ids, axis=0)
    cos, sin = rotary_tables(cfg.head_dim, max(s, cfg.max_position_embeddings),
                             cfg.rope_theta)
    positions = jnp.arange(s)
    if cfg.sliding_window is not None and s > cfg.sliding_window:
        mask = _sliding_window_mask(s, cfg.sliding_window, h.dtype)
    else:
        mask = causal_mask(s, dtype=h.dtype)

    n_rep = cfg.num_attention_heads // cfg.kv_heads

    def rel_mod(sl: dict, rel: str) -> dict:
        return {
            "weight": sl.get(f"{rel}.weight"),
            "bias": sl.get(f"{rel}.bias"),
            "A": sl.get(f"{rel}.A"),
            "B": sl.get(f"{rel}.B"),
        }

    def make_body(q):
        attn_cfg = q["attn"]

        def body(h, sl):
            residual = h
            hn = rms_norm(h, rel_mod(sl, "input_layernorm"), cfg.rms_norm_eps)
            qh = project_heads(hn, rel_mod(sl, "self_attn.q_proj"),
                               attn_cfg.q_proj, cfg.num_attention_heads)
            kh = project_heads(hn, rel_mod(sl, "self_attn.k_proj"),
                               attn_cfg.k_proj, cfg.kv_heads)
            vh = project_heads(hn, rel_mod(sl, "self_attn.v_proj"),
                               attn_cfg.v_proj, cfg.kv_heads)
            qh, kh = apply_rotary(qh, kh, cos, sin, positions)
            kh = repeat_kv(kh, n_rep)
            vh = repeat_kv(vh, n_rep)
            attn = eager_attention(
                qh, kh, vh, mask, attn_cfg.qk_matmul, attn_cfg.pv_matmul,
                scaling=cfg.head_dim**-0.5, scale_query=False,
            )
            attn = qlinear(merge_heads(attn), rel_mod(sl, "self_attn.o_proj"),
                           attn_cfg.o_proj)
            h = residual + attn

            residual = h
            hn = rms_norm(h, rel_mod(sl, "post_attention_layernorm"),
                          cfg.rms_norm_eps)
            gate = qlinear(hn, rel_mod(sl, "mlp.gate_proj"), q["gate_proj"])
            up = qlinear(hn, rel_mod(sl, "mlp.up_proj"), q["up_proj"])
            h = residual + qlinear(jax.nn.silu(gate) * up,
                                   rel_mod(sl, "mlp.down_proj"), q["down_proj"])
            return h, None

        return body

    for start, end, q in segments:
        seg = jax.tree_util.tree_map(lambda a: a[start:end], stacked)
        h, _ = jax.lax.scan(make_body(q), h, seg)
    h = rms_norm(h, _mod(rest, "model.norm"), cfg.rms_norm_eps)
    lm_head = rest.get("lm_head.weight", embed)
    return jnp.matmul(h, lm_head.T)
