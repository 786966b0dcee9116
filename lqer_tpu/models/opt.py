"""OPT decoder as a pure-JAX functional model with quantized ops.

Capability mirror of `/root/reference/src/lqer/models/opt_decoder.py` (409
LoC of forked HF modules). Architecture notes preserved:

* learned positional embeddings with offset 2 (HF `OPTLearnedPositionalEmbedding`)
* query scaled *before* QK^T (`opt_decoder.py:89`), quantized ``bmm_0``/``bmm_1``
  for QK^T and P·V (`opt_decoder.py:125-127,190-192`)
* pre-LN (``do_layer_norm_before``) + per-layer ``final_layer_norm`` + model
  level ``final_layer_norm``; ReLU MLP
* lm_head tied to embed_tokens

Params live in a flat ``{hf_name: array}`` dict so weight names match the
reference contract exactly (approximator regex keys
``model.decoder.layers.N.self_attn.q_proj.weight``, scale-dict keys ``….scale``,
low-rank keys ``….A``/``….B`` — SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.qlinear import qlinear
from .common import causal_mask, eager_attention, layer_norm, merge_heads, project_heads


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    do_layer_norm_before: bool = True
    enable_bias: bool = True
    layer_norm_elementwise_affine: bool = True
    pad_token_id: int = 1
    # OPT-350m: embeddings live in a smaller space with project_in/out
    # linears around the decoder stack (HF `word_embed_proj_dim`)
    word_embed_proj_dim: int | None = None
    arch: str = "opt"

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def embed_dim(self):
        return self.word_embed_proj_dim or self.hidden_size

    @staticmethod
    def tiny(vocab_size: int = 512, hidden: int = 64, layers: int = 2, heads: int = 4,
             ffn: int = 128, max_pos: int = 128) -> "OPTConfig":
        return OPTConfig(
            vocab_size=vocab_size, hidden_size=hidden, ffn_dim=ffn,
            num_hidden_layers=layers, num_attention_heads=heads,
            max_position_embeddings=max_pos,
        )

    @staticmethod
    def opt_125m() -> "OPTConfig":
        return OPTConfig()


# flat-name helpers -----------------------------------------------------------
def layer_prefix(i: int) -> str:
    return f"model.decoder.layers.{i}"


def _mod(params: dict, prefix: str) -> dict:
    """Collect {weight, bias, A, B} for a module prefix from the flat dict."""
    return {
        "weight": params.get(prefix + ".weight"),
        "bias": params.get(prefix + ".bias"),
        "A": params.get(prefix + ".A"),
        "B": params.get(prefix + ".B"),
    }


def init_params(cfg: OPTConfig, key, dtype=jnp.float32) -> dict:
    """Random-init params (tests run offline without HF checkpoints)."""
    params = {}
    k_iter = iter(jax.random.split(key, 4 + cfg.num_hidden_layers * 8))

    def randn(shape, scale=0.02):
        return (jax.random.normal(next(k_iter), shape) * scale).astype(dtype)

    h, f = cfg.hidden_size, cfg.ffn_dim
    e = cfg.embed_dim
    params["model.decoder.embed_tokens.weight"] = randn((cfg.vocab_size, e))
    params["model.decoder.embed_positions.weight"] = randn(
        (cfg.max_position_embeddings + 2, h)
    )
    if e != h:
        params["model.decoder.project_in.weight"] = randn((h, e))
        params["model.decoder.project_out.weight"] = randn((e, h))
    if cfg.do_layer_norm_before:
        params["model.decoder.final_layer_norm.weight"] = jnp.ones((h,), dtype)
        params["model.decoder.final_layer_norm.bias"] = jnp.zeros((h,), dtype)
    for i in range(cfg.num_hidden_layers):
        p = layer_prefix(i)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            params[f"{p}.self_attn.{proj}.weight"] = randn((h, h))
            params[f"{p}.self_attn.{proj}.bias"] = jnp.zeros((h,), dtype)
        params[f"{p}.fc1.weight"] = randn((f, h))
        params[f"{p}.fc1.bias"] = jnp.zeros((f,), dtype)
        params[f"{p}.fc2.weight"] = randn((h, f))
        params[f"{p}.fc2.bias"] = jnp.zeros((h,), dtype)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            params[f"{p}.{ln}.weight"] = jnp.ones((h,), dtype)
            params[f"{p}.{ln}.bias"] = jnp.zeros((h,), dtype)
    return params


def decoder_layer(
    h: jnp.ndarray,
    params: dict,
    cfg: OPTConfig,
    i: int,
    qcfg: dict | None,
    mask: jnp.ndarray,
    tap=None,
    backend: dict | None = None,
) -> jnp.ndarray:
    """One OPT decoder layer (`opt_decoder.py:212-322`).

    ``tap(module_prefix, x)`` is the functional stand-in for the reference's
    forward hooks on every nn.Linear (`statistic_profiler/scale.py:61-68`):
    called with the input of each linear during calibration.
    """
    from .fp_config import FP_LAYER_OPT  # resolved passthrough configs

    q = qcfg if qcfg is not None else FP_LAYER_OPT
    tap = tap or (lambda name, x: None)
    p = layer_prefix(i)
    attn_cfg = q["attn"]

    residual = h
    if cfg.do_layer_norm_before:
        h = layer_norm(h, _mod(params, f"{p}.self_attn_layer_norm"))

    for proj in ("q_proj", "k_proj", "v_proj"):
        tap(f"{p}.self_attn.{proj}", h)
    if backend is not None:
        # eval through the Pallas serving kernels (fused qkv / MLP
        # megakernel when packed) — same routers as the serving decode path
        from ..serving.decode import _lin, _lin_group, _mlp_fused_or_none

        def heads(y):
            b, s_, _ = y.shape
            return y.reshape(b, s_, cfg.num_attention_heads,
                             -1).transpose(0, 2, 1, 3)

        qy, ky, vy = _lin_group(
            h, params, p, "self_attn.qkv_proj",
            ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
            (attn_cfg.q_proj, attn_cfg.k_proj, attn_cfg.v_proj), backend,
        )
        qh, kh, vh = heads(qy), heads(ky), heads(vy)
    else:
        qh = project_heads(h, _mod(params, f"{p}.self_attn.q_proj"),
                           attn_cfg.q_proj, cfg.num_attention_heads)
        kh = project_heads(h, _mod(params, f"{p}.self_attn.k_proj"),
                           attn_cfg.k_proj, cfg.num_attention_heads)
        vh = project_heads(h, _mod(params, f"{p}.self_attn.v_proj"),
                           attn_cfg.v_proj, cfg.num_attention_heads)
    attn = eager_attention(
        qh, kh, vh, mask, attn_cfg.qk_matmul, attn_cfg.pv_matmul,
        scaling=cfg.head_dim**-0.5, scale_query=True,
    )
    attn = merge_heads(attn)
    tap(f"{p}.self_attn.out_proj", attn)
    if backend is not None:
        attn = _lin(attn, params, f"{p}.self_attn.out_proj", attn_cfg.o_proj,
                    backend)
    else:
        attn = qlinear(attn, _mod(params, f"{p}.self_attn.out_proj"),
                       attn_cfg.o_proj)
    h = residual + attn
    if not cfg.do_layer_norm_before:
        h = layer_norm(h, _mod(params, f"{p}.self_attn_layer_norm"))

    residual = h
    if cfg.do_layer_norm_before:
        h = layer_norm(h, _mod(params, f"{p}.final_layer_norm"))
    tap(f"{p}.fc1", h)
    if backend is not None:
        y = _mlp_fused_or_none(h, p, q["fc1"], q["fc2"], backend)
        if y is None:
            y = _lin(h, params, f"{p}.fc1", q["fc1"], backend)
            y = jax.nn.relu(y)
            y = _lin(y, params, f"{p}.fc2", q["fc2"], backend)
        h = y
    else:
        h = qlinear(h, _mod(params, f"{p}.fc1"), q["fc1"])
        h = jax.nn.relu(h)
        tap(f"{p}.fc2", h)
        h = qlinear(h, _mod(params, f"{p}.fc2"), q["fc2"])
    h = residual + h
    if not cfg.do_layer_norm_before:
        h = layer_norm(h, _mod(params, f"{p}.final_layer_norm"))
    return h


def forward(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: OPTConfig,
    layer_qcfgs: list[dict] | None = None,
    tap=None,
    return_hidden: bool = False,
    backend: dict | None = None,
) -> jnp.ndarray:
    """Full-causal-LM forward returning logits (b, s, vocab)."""
    b, s = input_ids.shape
    embed = params["model.decoder.embed_tokens.weight"]
    h = jnp.take(embed, input_ids, axis=0)
    if params.get("model.decoder.project_in.weight") is not None:  # OPT-350m
        h = jnp.matmul(h, params["model.decoder.project_in.weight"].T)
    positions = jnp.arange(s) + 2  # OPTLearnedPositionalEmbedding offset
    h = h + jnp.take(params["model.decoder.embed_positions.weight"], positions, axis=0)

    mask = causal_mask(s, dtype=h.dtype)
    for i in range(cfg.num_hidden_layers):
        qcfg = layer_qcfgs[i] if layer_qcfgs is not None else None
        h = decoder_layer(h, params, cfg, i, qcfg, mask, tap=tap,
                          backend=backend)

    if params.get("model.decoder.final_layer_norm.weight") is not None:
        h = layer_norm(h, _mod(params, "model.decoder.final_layer_norm"))
    if params.get("model.decoder.project_out.weight") is not None:
        h = jnp.matmul(h, params["model.decoder.project_out.weight"].T)
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
    "self_attn.out_proj", "fc1", "fc2",
    "self_attn_layer_norm", "final_layer_norm",
)


def stack_layer_params(params: dict, cfg: OPTConfig) -> tuple[dict, dict]:
    """Stack per-layer params into leading-axis (L, ...) arrays for lax.scan.

    Requires every layer to carry the same key set (all-or-none A/B). Returns
    (stacked, rest) where ``rest`` holds embeddings/norms/head/project_in|out.
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
