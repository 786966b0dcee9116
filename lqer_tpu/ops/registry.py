"""API-parity registries for quantized layers and functions.

The reference exposes `get_quantized_layer_cls("linear", q_config)` and
`get_quantized_func("matmul"/"bmm", q_config)`
(`/root/reference/src/lqer/quantize/quantized_layers/__init__.py:3-16`,
`quantized_functions/__init__.py:3-18`). The functional analogues here
return the resolved callable forms used throughout the TPU build.
"""

from __future__ import annotations

from .qlinear import QLinearConfig, qlinear, qmatmul, resolve_qmatmul


def get_quantized_layer_cls(kind: str, q_config: dict):
    """name → layer factory. "linear" with name flexible/flexible_lqer →
    a builder: ``build(l_config) -> (apply_fn, QLinearConfig)`` where
    ``apply_fn(x, params)`` computes the quantized linear."""
    assert kind == "linear", kind
    name = q_config.get("name", "flexible")
    if name not in ("flexible", "flexible_lqer"):
        raise ValueError(f"quantized layer {name!r} not supported")

    def build(l_config: dict | None = None):
        cfg = QLinearConfig.from_q_config(q_config, l_config)

        def apply_fn(x, params):
            return qlinear(x, params, cfg)

        return apply_fn, cfg

    return build


def get_quantized_func(kind: str, q_config: dict):
    """"matmul"/"bmm" → quantized matmul callable
    (`quantized_functions/__init__.py:3-18`; jnp.matmul covers both torch
    styles)."""
    if kind not in ("matmul", "bmm"):
        raise ValueError(f"quantized function {kind!r} not supported")
    name = q_config.get("name", "flexible")
    if name != "flexible":
        raise ValueError(f"quantized {kind} {name!r} not supported")
    return resolve_qmatmul(q_config)


__all__ = ["get_quantized_layer_cls", "get_quantized_func", "qmatmul"]
