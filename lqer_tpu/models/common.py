"""Shared functional building blocks for the decoder models.

The reference hot-swaps forked HuggingFace `nn.Module` decoder layers
(`/root/reference/src/lqer/models/{opt,llama,mistral}_decoder.py`). Here the
models are pure functions over parameter pytrees: quantization is selected by
passing resolved :class:`~lqer_tpu.ops.qlinear.QLinearConfig` objects, not by
swapping modules. Attention is eager (quantized QK^T / P·V must route through
the quantized matmul, matching the reference which disables flash/sdpa —
`llama_decoder.py:324-343`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.qlinear import QLinearConfig, qlinear


def layer_norm(x: jnp.ndarray, params: dict, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(x.dtype)
    if params.get("weight") is not None:
        y = y * params["weight"]
    if params.get("bias") is not None:
        y = y + params["bias"]
    return y


def rms_norm(x: jnp.ndarray, params: dict, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return params["weight"] * y.astype(x.dtype)


def rotary_tables(head_dim: int, max_pos: int, theta: float = 10000.0):
    """Precompute HF-convention cos/sin tables: freqs duplicated across the
    two halves (`transformers` LlamaRotaryEmbedding)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (max_pos, head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(q, k, cos, sin, positions):
    """q,k: (b, h, s, d); positions: (b, s) or (s,)."""
    c = jnp.take(cos, positions, axis=0)  # (..., s, d)
    s = jnp.take(sin, positions, axis=0)
    if c.ndim == 2:  # (s, d) -> broadcast over batch and heads
        c = c[None, None, :, :]
        s = s[None, None, :, :]
    else:  # (b, s, d)
        c = c[:, None, :, :]
        s = s[:, None, :, :]
    c = c.astype(q.dtype)
    s = s.astype(q.dtype)
    q_rot = q * c + rotate_half(q) * s
    k_rot = k * c + rotate_half(k) * s
    return q_rot, k_rot


def causal_mask(seq_len: int, dtype=jnp.float32, offset: int = 0) -> jnp.ndarray:
    """(1, 1, s, s+offset) additive mask; offset>0 for decode with KV cache."""
    q_idx = jnp.arange(seq_len)[:, None] + offset
    k_idx = jnp.arange(seq_len + offset)[None, :]
    mask = jnp.where(k_idx <= q_idx, 0.0, jnp.finfo(dtype).min)
    return mask.astype(dtype)[None, None, :, :]


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(b, kv_heads, s, d) -> (b, kv_heads*n_rep, s, d) for GQA."""
    if n_rep == 1:
        return x
    b, h, s, d = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, :], (b, h, n_rep, s, d))
    return x.reshape(b, h * n_rep, s, d)


def eager_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None,
    qk_matmul: Callable,
    pv_matmul: Callable,
    scaling: float,
    *,
    scale_query: bool = False,
) -> jnp.ndarray:
    """Eager attention with quantized QK^T (`matmul_0`/`bmm_0`) and P·V
    (`matmul_1`/`bmm_1`) — `llama_decoder.py:259-296`, `opt_decoder.py:125-192`.

    The quantized matmuls run on 3-D ``(b·h, s, d)`` operands, matching the
    reference exactly (`llama_decoder.py:261-263`, `opt_decoder.py:117-120`):
    the activation quantizer's shared-exponent blocks must not span heads.

    ``scale_query=True`` follows OPT (scaling folded into Q before QK^T,
    `opt_decoder.py:89`); otherwise the scores are scaled after the matmul
    (Llama/Mistral convention).
    """
    b, h, s, d = q.shape
    kv_len = k.shape[2]
    q3 = q.reshape(b * h, s, d)
    k3 = k.reshape(b * h, kv_len, d)
    v3 = v.reshape(b * h, kv_len, d)
    if scale_query:
        q3 = q3 * scaling
        scores = qk_matmul(q3, jnp.swapaxes(k3, -1, -2))
    else:
        scores = qk_matmul(q3, jnp.swapaxes(k3, -1, -2)) * scaling
    scores = scores.reshape(b, h, s, kv_len)
    if mask is not None:
        scores = scores + mask
        scores = jnp.maximum(scores, jnp.finfo(scores.dtype).min)
    # fp32 softmax (HF upcasts; exact for our fp32 eval paths too)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = pv_matmul(probs.reshape(b * h, s, kv_len), v3)
    return out.reshape(b, h, s, d)


@dataclasses.dataclass(frozen=True)
class AttnQConfig:
    """Resolved quantization for one attention block.

    ``qk_cfg``/``pv_cfg`` keep the raw matmul q_configs so the fused Pallas
    attention can check eligibility and re-derive operand quantizers."""

    q_proj: QLinearConfig
    k_proj: QLinearConfig
    v_proj: QLinearConfig
    o_proj: QLinearConfig
    qk_matmul: Callable
    pv_matmul: Callable
    qk_cfg: dict | None = None
    pv_cfg: dict | None = None


def project_heads(x, params, cfg: QLinearConfig, num_heads: int):
    """qlinear + reshape (b, s, e) -> (b, h, s, d)."""
    b, s, _ = x.shape
    y = qlinear(x, params, cfg)
    return y.reshape(b, s, num_heads, -1).transpose(0, 2, 1, 3)


def merge_heads(x):
    """(b, h, s, d) -> (b, s, e)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


# ---------------------------------------------------------------------------
# fused Pallas attention integration
# ---------------------------------------------------------------------------
def _std_a8(cfg: dict | None) -> bool:
    """True if cfg is the standard activation format the fused kernel
    implements: block_fp, exponent_width 8, block [1,16], skip_first_dim."""
    if not cfg:
        return False
    return (
        cfg.get("name") == "block_fp"
        and cfg.get("exponent_width") == 8
        and list(cfg.get("block_size", [])) == [1, 16]
        and cfg.get("skip_first_dim") is True
        and cfg.get("exponent_bias") in (None, "NA")
    )


def supports_fused_attention(attn_cfg: "AttnQConfig",
                             kv_pre_quantized: bool = False) -> bool:
    """Fused path covers the reference's canonical A8 attention quantization
    (both operands of both matmuls in the standard activation format with a
    common width). ``kv_pre_quantized``: K/V arrive already on their cache
    write grid (quantize-once-at-write serving) — only the q/p-side
    quantizers run in the kernel, so the K/V-side widths are exempt from
    the common-width requirement (e.g. a KV4 cache with A8 q/probs)."""
    cfgs = []
    for mm in (attn_cfg.qk_cfg, attn_cfg.pv_cfg):
        if mm is None:
            return False
        x = mm.get("x_quantizer") or mm.get("default")
        w = mm.get("w_quantizer") or mm.get("default")
        cfgs += [x] if kv_pre_quantized else [x, w]
    if not all(_std_a8(c) for c in cfgs):
        return False
    widths = {c["width"] for c in cfgs}
    return len(widths) == 1


def fused_quantized_attention(
    q: jnp.ndarray,  # (b, h, s, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_cfg: "AttnQConfig",
    scaling: float,
    *,
    scale_query: bool = False,
    interpret: bool | None = None,
    kv_values_pre_quantized: bool = False,
) -> jnp.ndarray:
    """Causal attention through the fused Pallas kernel with the same
    quantization semantics as the eager path (pre-quantized Q/K/V, in-kernel
    P quantization). Caller must have checked `supports_fused_attention`.

    ``kv_values_pre_quantized``: K/V already carry their operand grid (the
    MXINT8 quantized-cache serving semantics — quantize-once-at-write); the
    K^T token-axis and V quantizations are skipped, matching
    `serving.decode._kv_skip_matmuls`."""
    from ..ops.quantizers import block_fp_quantizer
    from ..ops.pallas.attention import quantized_attention

    width = (attn_cfg.qk_cfg.get("x_quantizer")
             or attn_cfg.qk_cfg.get("default"))["width"]

    def aq(x):
        return block_fp_quantizer(
            x, width=width, exponent_width=8, block_size=[1, 16],
            skip_first_dim=True,
        )

    b, h, s, d = q.shape
    kv_len = k.shape[2]
    q3 = q.reshape(b * h, s, d)
    k3 = k.reshape(b * h, kv_len, d)
    v3 = v.reshape(b * h, kv_len, d)
    if scale_query:
        q3 = q3 * scaling
        kernel_scale = 1.0
    else:
        kernel_scale = scaling
    q_q = aq(q3)
    if kv_values_pre_quantized:
        k_q, v_q = k3, v3
    else:
        # K^T quantization groups run along tokens (the eager layout)
        k_q = jnp.swapaxes(aq(jnp.swapaxes(k3, 1, 2)), 1, 2)
        v_q = aq(v3)
    out = quantized_attention(
        q_q, k_q, v_q, scale=kernel_scale,
        tile_s=min(256, max(8, s)), p_width=width, group=16,
        causal=True, interpret=interpret,
    )
    return out.reshape(b, h, s, d).astype(q.dtype)
