"""Pallas serving backend: run every quantized linear through the fused
W4A8 dequant-GEMM + low-rank kernel instead of the software emulation.

``prepare_serving_params`` converts a PTQ'd flat param dict into packed
MXINT4 kernel operands (offline, once per model); ``serving_linear`` is the
drop-in replacement for the emulated ``qlinear`` used by the decode path.

Numerics: identical math to the emulation (weights were already W4-grid
values after ``prepare_ptq``; re-deriving codes/exponents from grid values is
exact), so serving ppl == emulated ppl up to f32 accumulation order.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import models
from ..ops.pallas import prepare_w4_weights, qlinear_w4_fused
from ..ops.storage import MXINT4
from ..utils.logging import get_logger

logger = get_logger("serving.pallas")

TILE_K = 256


def _pick_tile_n(n: int) -> int:
    for tn in (512, 256, 128):
        if n % tn == 0:
            return tn
    raise ValueError(f"out_features {n} not divisible by a supported tile")


def prepare_serving_params(
    params: dict,
    cfg,
    layer_qcfgs,
    tile_k: int = TILE_K,
) -> dict:
    """Pack every quantized linear: {module_prefix: prep dict}.

    ``params`` must hold the ORIGINAL (un-PTQ'd) weights: ``quantize_mx``
    reproduces the W4 ``block_fp`` quantization bit-exactly from the
    originals, whereas re-encoding already-quantized values hits block_fp's
    non-idempotence (a block max landing exactly on a power of two saturates
    again on the second pass — see tests/test_quantizers.py
    ``test_second_pass_stable``). Biases are quantized here with the layer's
    b_quantizer (the PTQ latch, `linear.py:50-59`); A/B come from the
    approximator already quantized.
    """
    arrays: dict = {}
    meta: dict = {}
    for i in range(cfg.num_hidden_layers):
        for prefix, proj in models.quantizable_module_prefixes(cfg, i):
            w = params[prefix + ".weight"]
            if w.shape[1] % tile_k != 0:
                raise ValueError(
                    f"{prefix}: in_features {w.shape[1]} not divisible by "
                    f"tile_k {tile_k}"
                )
            qc = models._proj_qcfg(layer_qcfgs[i], proj)
            bias = params.get(prefix + ".bias")
            if bias is not None:
                bias = qc.b_quantizer(bias)
            prep = prepare_w4_weights(
                w,
                a=params.get(prefix + ".A"),
                b=params.get(prefix + ".B"),
                bias=bias,
                fmt=MXINT4,
                tile_k=tile_k,
            )
            # split traced arrays from static metadata so the whole backend
            # can be passed as a jit argument (tile sizes must stay static)
            arrays[prefix] = {
                k: prep[k] for k in ("packed", "exps", "a", "b", "bias")
            }
            meta[prefix] = {
                "tile_k": tile_k,
                "tile_n": _pick_tile_n(w.shape[0]),
                "fmt": MXINT4,
            }
    logger.info("packed %d linears for the Pallas backend", len(meta))
    return {"arrays": arrays, "meta": meta}


def serving_linear(
    x: jnp.ndarray,  # (b, s, in) float/bf16
    prefix: str,
    backend: dict,
    qc,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Quantize activations (exact-in-bf16 MXINT8 emulation) then run the
    fused kernel. ``backend`` = {"arrays": {...}, "meta": {...}} from
    :func:`prepare_serving_params` (arrays may arrive traced)."""
    prep = dict(backend["arrays"][prefix])
    prep.update(backend["meta"][prefix])
    b, s, k = x.shape
    x_q = qc.x_quantizer(x).astype(jnp.bfloat16).reshape(b * s, k)
    y = qlinear_w4_fused(
        x_q,
        prep,
        tile_m=128,
        tile_n=prep["tile_n"],
        out_dtype=jnp.float32,
        interpret=interpret,
    )
    return y.reshape(b, s, -1).astype(x.dtype)
