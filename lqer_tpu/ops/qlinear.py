"""Quantized linear ops with optional low-rank LQER correction.

Functional equivalents of the reference's quantized layers
(`/root/reference/src/lqer/quantize/quantized_layers/linear.py:12-166`).
Instead of `nn.Linear` subclasses that mutate their own weights on first
forward (the `is_ptq` latch, `linear.py:50-59`), we split the op into:

* :func:`prepare_qlinear_params` — the one-time PTQ step: quantize W (and b)
  in the param pytree. Done offline/at load, which is the same math as the
  reference latch but functional and jit-friendly.
* :func:`qlinear` — the per-call math
  ``Y = X_q W_q^T + b_q  [+ B_out_q((A_out_q(X_q A)) B)]``
  (`linear.py:145-166`). Activation quantization happens every call with
  data-dependent shared exponents, exactly like the reference.

A config dict (same schema as the reference q_config/l_config) is resolved
once into a :class:`QLinearConfig` of concrete quantizer callables.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from .quantizers import make_quantizer, passthrough_quantizer


@dataclasses.dataclass(frozen=True)
class QLinearConfig:
    """Resolved quantizers for one linear layer.

    Defaults mirror `LinearFlexible._setup_quantizers` /
    `LinearFlexibleLqer._setup_quantizers` (`linear.py:89-132`):
    x/w/b fall back to ``q_config["default"]``; A_out/B_out fall back to the
    x-quantizer config (part of the claimed hardware model — the low-rank
    partial products are quantized to the activation format).
    """

    x_quantizer: Callable = passthrough_quantizer
    w_quantizer: Callable = passthrough_quantizer
    b_quantizer: Callable = passthrough_quantizer
    a_out_quantizer: Callable = passthrough_quantizer
    b_out_quantizer: Callable = passthrough_quantizer
    is_ptq: bool = True
    is_lqer: bool = False
    rank: int = 0
    # "flexible" (reference LinearFlexible semantics) or "llm_int8" (emulated
    # bitsandbytes outlier-decomposition linear — see ops/llm_int8.py);
    # llm_int8 is dynamic per-forward, so is_ptq is forced False for it
    mode: str = "flexible"
    int_bits: int = 8
    int_threshold: float = 6.0
    # raw resolved config dicts (not hashed/compared — the callables above
    # are memoized per config, so identity compare covers equality); kept so
    # the serving backend can check kernel-eligibility of a format
    x_cfg: dict | None = dataclasses.field(default=None, compare=False)
    w_cfg: dict | None = dataclasses.field(default=None, compare=False)
    a_out_cfg: dict | None = dataclasses.field(default=None, compare=False)
    b_out_cfg: dict | None = dataclasses.field(default=None, compare=False)

    @staticmethod
    def from_q_config(q_config: dict, l_config: dict | None = None) -> "QLinearConfig":
        if q_config.get("name") in ("llm_int8", "llm_int4"):
            bits = 4 if q_config["name"].endswith("4") else \
                int(q_config.get("width", 8))
            return QLinearConfig(
                mode="llm_int8",
                int_bits=bits,
                int_threshold=float(q_config.get("threshold", 6.0)),
                is_ptq=False,
            )

        def cfg(key, fallback_keys=()):
            c = q_config.get(key)
            for fk in fallback_keys:
                if c is None:
                    c = q_config.get(fk)
            if c is None or c is False:
                c = q_config.get("default")
            return c

        x_cfg = cfg("x_quantizer")
        w_cfg = cfg("w_quantizer")
        b_cfg = cfg("b_quantizer")
        a_out_cfg = cfg("A_out_quantizer", fallback_keys=("x_quantizer",))
        b_out_cfg = cfg("B_out_quantizer", fallback_keys=("x_quantizer",))

        is_lqer = q_config.get("name") == "flexible_lqer"
        rank = int(l_config.get("rank", 0)) if (l_config and is_lqer) else 0
        return QLinearConfig(
            x_quantizer=make_quantizer(x_cfg),
            w_quantizer=make_quantizer(w_cfg),
            b_quantizer=make_quantizer(b_cfg),
            a_out_quantizer=make_quantizer(a_out_cfg),
            b_out_quantizer=make_quantizer(b_out_cfg),
            is_ptq=bool(q_config.get("is_ptq", False)),
            is_lqer=is_lqer,
            rank=rank,
            x_cfg=x_cfg,
            w_cfg=w_cfg,
            a_out_cfg=a_out_cfg,
            b_out_cfg=b_out_cfg,
        )


def prepare_qlinear_params(params: dict, cfg: QLinearConfig) -> dict:
    """One-time PTQ weight/bias quantization (`linear.py:50-59` latch).

    ``params``: {"weight": (out,in), optional "bias": (out,), optional
    "A": (in,rank), "B": (rank,out)}. A/B are stored as produced by the
    approximator and are NOT requantized here (they were quantized when
    computed, `lqer_svd.py:46-47`).
    """
    out = dict(params)
    out["weight"] = cfg.w_quantizer(params["weight"])
    if params.get("bias") is not None:
        out["bias"] = cfg.b_quantizer(params["bias"])
    return out


def qlinear(
    x: jnp.ndarray,
    params: dict,
    cfg: QLinearConfig,
    *,
    weights_prepared: bool | None = None,
) -> jnp.ndarray:
    """``Y = X_q W_q^T + b_q [+ B_out_q((A_out_q(X_q A)) B)]``
    (`linear.py:145-166`).

    ``weights_prepared`` defaults to ``cfg.is_ptq``: in PTQ mode weights were
    quantized offline by :func:`prepare_qlinear_params` (the reference's
    first-forward latch); with ``is_ptq=False`` weights fake-quantize on every
    call (`linear.py:158-166` — the QAT/training path, differentiable via the
    quantizers' STE custom_vjp).
    """
    if cfg.mode == "llm_int8":
        from .llm_int8 import llm_int_linear

        return llm_int_linear(
            x, params["weight"], params.get("bias"),
            bits=cfg.int_bits, threshold=cfg.int_threshold,
        )
    if weights_prepared is None:
        weights_prepared = cfg.is_ptq
    w = params["weight"]
    b = params.get("bias")
    if not weights_prepared:
        w = cfg.w_quantizer(w)
        if b is not None:
            b = cfg.b_quantizer(b)

    x_q = cfg.x_quantizer(x)
    y = jnp.matmul(x_q, w.T)
    if b is not None:
        y = y + b

    if cfg.is_lqer and params.get("A") is not None:
        xa = cfg.a_out_quantizer(jnp.matmul(x_q, params["A"]))
        xab = cfg.b_out_quantizer(jnp.matmul(xa, params["B"]))
        y = y + xab
    return y


def _bf16_exact(cfg: dict | None) -> bool:
    """True when the quantizer's OUTPUT grid is exactly representable in
    bfloat16 (<= 8 significand bits): block_fp / integer with width <= 9.
    Then running the matmul on bf16 operands (f32 accumulation) computes the
    same products as the f32 matmul — the MXU's native fast path instead of
    the 3-pass f32 decomposition, and half the operand traffic."""
    return bool(
        cfg and cfg.get("name") in ("block_fp", "integer")
        and cfg.get("width", 99) <= 9
    )


def _resolve_operands(q_config: dict):
    x_cfg = q_config.get("x_quantizer") or q_config.get("default")
    y_cfg = q_config.get("w_quantizer") or q_config.get("default")
    return (make_quantizer(x_cfg), make_quantizer(y_cfg),
            _bf16_exact(x_cfg) and _bf16_exact(y_cfg))


def qmatmul(x: jnp.ndarray, y: jnp.ndarray, q_config: dict) -> jnp.ndarray:
    """Quantize both operands then matmul — used for QK^T and P·V inside
    attention (`quantized_functions/matmul.py:12-37`). jnp.matmul covers both
    the reference's `torch.matmul` and `torch.bmm` (batched) cases."""
    return resolve_qmatmul(q_config)(x, y)


def resolve_qmatmul(q_config: dict | None) -> Callable:
    """Pre-resolve the operand quantizers of a quantized matmul so the
    returned callable is cheap to trace. When both operand grids are exact
    in bf16 the dot runs on bf16 operands with f32 accumulation (identical
    products; result cast back to the x operand's dtype)."""
    if not q_config:
        return lambda a, b: jnp.matmul(a, b)
    xq, yq, bf16_fast = _resolve_operands(q_config)

    def fn(a, b):
        qa, qb = xq(a), yq(b)
        if bf16_fast:
            return jnp.matmul(
                qa.astype(jnp.bfloat16), qb.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(qa.dtype)
        return jnp.matmul(qa, qb)

    return fn
