"""Model registry + functional "model surgery".

The reference swaps forked HF decoder layers into a pretrained torch model
(`/root/reference/src/lqer/models/__init__.py:21-33`). Functionally, a
"quantized model" here is: (arch config, flat param dict, resolved per-layer
quantizer configs). `quantize_model` returns the resolved configs + PTQ'd
params; `load_low_rank_dict` is a flat dict update (the reference's
`load_state_dict(strict=False)` filling every `.A`/`.B` —
`runners.py:220-223`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from .config_expand import (
    LLAMA_ATTN_PROJS,
    LLAMA_MLP_PROJS,
    OPT_ATTN_PROJS,
    OPT_MLP_PROJS,
    resolve_model_configs,
)
from . import llama as llama_mod
from . import opt as opt_mod
from .llama import LlamaConfig
from .opt import OPTConfig

ARCH_MODULES = {"opt": opt_mod, "llama": llama_mod, "mistral": llama_mod}

# model_name -> config factory (HF ids kept for config-file compatibility)
MODEL_CONFIGS: dict[str, Callable] = {
    "facebook/opt-125m": OPTConfig.opt_125m,
    "facebook/opt-350m": lambda: OPTConfig(
        hidden_size=1024, ffn_dim=4096, num_hidden_layers=24,
        num_attention_heads=16, do_layer_norm_before=False,
        word_embed_proj_dim=512,
    ),
    "facebook/opt-1.3b": lambda: OPTConfig(
        hidden_size=2048, ffn_dim=8192, num_hidden_layers=24, num_attention_heads=32
    ),
    "facebook/opt-2.7b": lambda: OPTConfig(
        hidden_size=2560, ffn_dim=10240, num_hidden_layers=32, num_attention_heads=32
    ),
    "facebook/opt-6.7b": lambda: OPTConfig(
        hidden_size=4096, ffn_dim=16384, num_hidden_layers=32, num_attention_heads=32
    ),
    "facebook/opt-13b": lambda: OPTConfig(
        hidden_size=5120, ffn_dim=20480, num_hidden_layers=40, num_attention_heads=40
    ),
    "facebook/opt-30b": lambda: OPTConfig(
        hidden_size=7168, ffn_dim=28672, num_hidden_layers=48, num_attention_heads=56
    ),
    "huggyllama/llama-7b": LlamaConfig.llama_7b,
    "huggyllama/llama-13b": lambda: LlamaConfig(
        hidden_size=5120, intermediate_size=13824, num_hidden_layers=40,
        num_attention_heads=40,
    ),
    "huggyllama/llama-30b": lambda: LlamaConfig(
        hidden_size=6656, intermediate_size=17920, num_hidden_layers=60,
        num_attention_heads=52,
    ),
    "huggyllama/llama-65b": lambda: LlamaConfig(
        hidden_size=8192, intermediate_size=22016, num_hidden_layers=80,
        num_attention_heads=64,
    ),
    "TinyLlama/TinyLlama-1.1B-Chat-v1.0": lambda: LlamaConfig(
        hidden_size=2048, intermediate_size=5632, num_hidden_layers=22,
        num_attention_heads=32, num_key_value_heads=4,
        max_position_embeddings=2048, rms_norm_eps=1e-5,
    ),
    "meta-llama/Llama-2-7b-hf": LlamaConfig.llama_7b,
    "meta-llama/Llama-2-13b-hf": lambda: LlamaConfig(
        hidden_size=5120, intermediate_size=13824, num_hidden_layers=40,
        num_attention_heads=40,
    ),
    "meta-llama/Llama-2-70b-hf": lambda: LlamaConfig(
        hidden_size=8192, intermediate_size=28672, num_hidden_layers=80,
        num_attention_heads=64, num_key_value_heads=8, max_position_embeddings=4096,
        rms_norm_eps=1e-5,
    ),
    "lmsys/vicuna-7b-v1.5": LlamaConfig.llama_7b,
    "lmsys/vicuna-13b-v1.5": lambda: LlamaConfig(
        hidden_size=5120, intermediate_size=13824, num_hidden_layers=40,
        num_attention_heads=40,
    ),
    "mistralai/Mistral-7B-v0.1": LlamaConfig.mistral_7b,
    # the reference's mistral template uses the OpenOrca fine-tune
    # (`configs/template/mistral-7b.toml:10`): same arch, 2 extra tokens
    "Open-Orca/Mistral-7B-OpenOrca": lambda: dataclasses.replace(
        LlamaConfig.mistral_7b(), vocab_size=32002
    ),
}


def get_model_config(model_name: str):
    if model_name in MODEL_CONFIGS:
        return MODEL_CONFIGS[model_name]()
    raise ValueError(
        f"Unknown model {model_name!r}. Known: {sorted(MODEL_CONFIGS)}"
    )


def get_arch_module(cfg):
    return ARCH_MODULES[cfg.arch]


def quantizable_module_prefixes(cfg, layer_idx: int) -> list[tuple[str, str]]:
    """(module_prefix, proj_key) pairs of the quantized linears in one layer."""
    if cfg.arch == "opt":
        p = opt_mod.layer_prefix(layer_idx)
        pairs = [(f"{p}.self_attn.{proj}", proj) for proj in OPT_ATTN_PROJS]
        pairs += [(f"{p}.{proj}", proj) for proj in OPT_MLP_PROJS]
    else:
        p = llama_mod.layer_prefix(layer_idx)
        pairs = [(f"{p}.self_attn.{proj}", proj) for proj in LLAMA_ATTN_PROJS]
        pairs += [(f"{p}.mlp.{proj}", proj) for proj in LLAMA_MLP_PROJS]
    return pairs


def _proj_qcfg(layer_qcfg: dict, proj: str):
    if proj in ("q_proj", "k_proj", "v_proj"):
        return getattr(layer_qcfg["attn"], proj)
    if proj in ("o_proj", "out_proj"):
        return layer_qcfg["attn"].o_proj
    return layer_qcfg[proj]


def prepare_ptq(params: dict, cfg, layer_qcfgs) -> dict:
    """One-time PTQ weight/bias quantization across all quantized linears
    (the reference's first-forward latch, `linear.py:50-59`, applied eagerly)."""
    if layer_qcfgs is None:
        return params
    params = dict(params)
    for i in range(cfg.num_hidden_layers):
        for prefix, proj in quantizable_module_prefixes(cfg, i):
            qc = _proj_qcfg(layer_qcfgs[i], proj)
            if not qc.is_ptq:
                continue
            wk, bk = prefix + ".weight", prefix + ".bias"
            params[wk] = qc.w_quantizer(params[wk])
            if params.get(bk) is not None:
                params[bk] = qc.b_quantizer(params[bk])
    return params


def quantize_model(cfg, q_config: dict | None, l_config: dict | None):
    """Resolve per-layer quantizer configs for a model (dispatch equivalent of
    `models/__init__.py:21-33` + the per-arch builders)."""
    return resolve_model_configs(cfg.num_hidden_layers, q_config, l_config, cfg.arch)


def load_low_rank_dict(params: dict, low_rank_dict: dict, dtype=None) -> dict:
    """Fill every `.A`/`.B` (`runners.py:220-223`)."""
    params = dict(params)
    for k, v in low_rank_dict.items():
        arr = jnp.asarray(v)
        if dtype is not None:
            arr = arr.astype(dtype)
        params[k] = arr
    return params


def forward(params, input_ids, cfg, layer_qcfgs=None, tap=None):
    return get_arch_module(cfg).forward(params, input_ids, cfg, layer_qcfgs, tap=tap)


def init_params(cfg, key, dtype=jnp.float32):
    return get_arch_module(cfg).init_params(cfg, key, dtype)


__all__ = [
    "OPTConfig",
    "LlamaConfig",
    "MODEL_CONFIGS",
    "get_model_config",
    "get_arch_module",
    "quantize_model",
    "prepare_ptq",
    "load_low_rank_dict",
    "forward",
    "init_params",
    "quantizable_module_prefixes",
]


def forward_sequence_classification(
    params,
    input_ids,
    cfg,
    layer_qcfgs=None,
    pad_token_id: int | None = None,
):
    """Sequence classification over the quantized decoder (the reference's
    `*ForSequenceClassification` dispatch targets, `models/__init__.py:21-33`).

    HF semantics: a bias-free ``score`` head over the hidden state of the
    LAST non-pad token per sequence (`transformers`
    `LlamaForSequenceClassification`/`OPTForSequenceClassification`).
    ``params["score.weight"]`` holds (num_labels, hidden).
    """
    import jax.numpy as _jnp

    h = get_arch_module(cfg).forward(
        params, input_ids, cfg, layer_qcfgs, return_hidden=True
    )
    logits = _jnp.matmul(h, params["score.weight"].T)  # (b, s, labels)
    pad = pad_token_id if pad_token_id is not None else getattr(
        cfg, "pad_token_id", None)
    if pad is None:
        last = _jnp.full((input_ids.shape[0],), input_ids.shape[1] - 1)
    else:
        is_real = (input_ids != pad).astype(_jnp.int32)
        # index of the last non-pad token (HF: first pad position - 1)
        last = _jnp.maximum(
            _jnp.sum(is_real, axis=-1) - 1, 0
        )
    return _jnp.take_along_axis(
        logits, last[:, None, None].astype(_jnp.int32), axis=1
    )[:, 0, :]
