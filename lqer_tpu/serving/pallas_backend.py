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
from ..ops.qlinear import _bf16_exact
from ..ops.storage import MXINT4
from ..utils.logging import get_logger

logger = get_logger("serving.pallas")

TILE_K = int(__import__("os").environ.get("LQER_TILE_K", "2048"))
# K-tile cap; per-module tiles via _pick_tile_k (env-overridable for A/B).
# 2048 at 7B shapes: fewer grid steps / bigger slab DMAs — measured
# 377 -> 365 us/layer on the kernel chain (round 5).
# token count at which the linears switch from the VMEM-resident fused
# kernels (decode: weights fetched once, activations tiny) to the
# dequant-once-to-HBM + XLA-dense-dot path (prefill/eval: the kernel grid
# refetches the whole weight stream per 128-row M tile). Overridable for
# A/B via LQER_LARGEM_THRESHOLD.
import os as _os

_LARGEM_THRESHOLD = int(_os.environ.get("LQER_LARGEM_THRESHOLD", "512"))
_INKERNEL_XQ = bool(_os.environ.get("LQER_INKERNEL_XQ"))

# Projections sharing one input activation, fusable into a single kernel
# launch by concatenating their (packed) weights along the output axis —
# this shares the X VMEM residency AND the activation quantization, and
# cuts per-layer launches 7 → 4 (qkv, o, gate|up, down). Relevant on this
# environment's remote-compile TPUs where per-launch overhead (~60-80 µs)
# dominates small decode GEMMs (ROADMAP "megakernel" item, step 1).
_FUSE_GROUPS_LLAMA = (
    ("self_attn.qkv_proj",
     ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj")),
    ("mlp.gateup_proj", ("mlp.gate_proj", "mlp.up_proj")),
)
_FUSE_GROUPS_OPT = (
    ("self_attn.qkv_proj",
     ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj")),
)


def fuse_groups_for(cfg):
    return _FUSE_GROUPS_OPT if cfg.arch == "opt" else _FUSE_GROUPS_LLAMA


def mlp_members_for(cfg):
    """(gate, up, down) rel-prefixes of the MLP megakernel's linears; up is
    None for the un-gated (OPT relu) variant."""
    if cfg.arch == "opt":
        return ("fc1", None, "fc2")
    return ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj")


def _is_mx8_act(x_cfg: dict | None) -> bool:
    """The kernel's in-VMEM activation re-quantization implements the
    canonical MXINT8 format: block_fp, [1,16] groups along features,
    8-bit exponent, no bias override."""
    return bool(
        x_cfg
        and x_cfg.get("name") == "block_fp"
        and list(x_cfg.get("block_size", ())) == [1, 16]
        and x_cfg.get("skip_first_dim", False)
        and x_cfg.get("exponent_width") == 8
        and x_cfg.get("exponent_bias") is None
    )


# ---------------------------------------------------------------------------
# format-eligibility guard
#
# The fused kernel bakes in exactly ONE weight format (MXINT4: block_fp,
# width 4, [1,16] groups along in_features, 8-bit shared exponent) and ONE
# in-kernel partial-product quantizer shape (per-row groups of 16, block_fp
# semantics). Any layer whose configured quantizers don't match — the
# reference's W3 / integer-INT [1,-1] / minifloat / W-only-passthrough sweep
# variants (`sweep_lqer_act_int.sh:57-66`, `opt-6.7b-int.toml`) — must NOT be
# packed: the decode/eval routers fall back to the software emulation for any
# module absent from ``backend["meta"]``, which keeps numerics exact instead
# of silently serving the wrong format.
# ---------------------------------------------------------------------------
_INELIGIBLE = "ineligible"


def _is_mx4_weight(w_cfg: dict | None) -> bool:
    """True iff the configured weight quantizer is exactly the packed
    MXINT4 format ``prepare_w4_weights``/``quantize_mx`` reproduce."""
    return bool(
        w_cfg
        and w_cfg.get("name") == "block_fp"
        and w_cfg.get("width") == 4
        and w_cfg.get("exponent_width") == 8
        and w_cfg.get("exponent_bias") is None
        and list(w_cfg.get("block_size", ())) == [1, 16]
        and not w_cfg.get("skip_first_dim", False)
    )


def _partial_quant_width(cfg: dict | None, last_dim: int):
    """Width at which the kernel's ``_quantize_rows_mx`` reproduces this
    A_out/B_out quantizer on an (M, last_dim) partial product.

    Returns ``None`` for passthrough (in-kernel quantization disabled),
    an ``int`` width for the canonical activation block_fp format, or
    ``_INELIGIBLE`` when the kernel cannot reproduce the config (wrong
    family/blocking, or a last_dim the kernel's group fallback would block
    differently than the reference's padding — exact only for last_dim <= 16
    or multiples of 16)."""
    if cfg is None or cfg.get("name") == "passthrough":
        return None
    if not (
        cfg.get("name") == "block_fp"
        and cfg.get("exponent_width") == 8
        and cfg.get("exponent_bias") is None
        and list(cfg.get("block_size", ())) == [1, 16]
        and cfg.get("skip_first_dim", False)
        and cfg.get("width", 99) <= 9
    ):
        return _INELIGIBLE
    if last_dim > 16 and last_dim % 16 != 0:
        return _INELIGIBLE
    return int(cfg["width"])


def _bf16_exact_values(arr) -> bool:
    """Concrete check that an A/B factor's values survive the kernel's bf16
    operand cast losslessly (the approximator quantizes them, but the
    configured A/B format may be wider than 9 bits). Under tracing (packing
    inside jit, e.g. layer-streamed generation in the 7B bench) the values
    are unavailable — the check is skipped and the caller is responsible for
    supplying bf16-exact factors."""
    import jax as _jax

    if isinstance(arr, _jax.core.Tracer):
        return True
    a32 = jnp.asarray(arr, jnp.float32)
    return bool(jnp.all(a32.astype(jnp.bfloat16).astype(jnp.float32) == a32))


def _eligibility(qc, w, a, b, tile_k: int):
    """(ok, reason, xa_width, out_width) for packing one linear through the
    fused kernel. ``reason`` names the first failing constraint."""
    n_out, k_in = w.shape
    if not _is_mx4_weight(qc.w_cfg):
        return False, f"w_quantizer {qc.w_cfg} is not canonical MXINT4", None, None
    if not _bf16_exact(qc.x_cfg):
        return False, f"x_quantizer {qc.x_cfg} not exact in bf16", None, None
    if _pick_tile_k(k_in, tile_k) == 0:
        return False, f"in_features {k_in} not tileable (cap {tile_k})", None, None
    if n_out % 128 != 0:
        return False, f"out_features {n_out} % 128 != 0", None, None
    xa_width = out_width = None
    if a is not None:
        rank = a.shape[1]
        xa_width = _partial_quant_width(qc.a_out_cfg, rank)
        if xa_width is _INELIGIBLE:
            return False, f"A_out_quantizer {qc.a_out_cfg} (rank {rank})", None, None
        out_width = _partial_quant_width(qc.b_out_cfg, n_out)
        if out_width is _INELIGIBLE:
            return False, f"B_out_quantizer {qc.b_out_cfg}", None, None
        if not (_bf16_exact_values(a) and _bf16_exact_values(b)):
            return False, "A/B values not exact in bf16", None, None
    return True, "", xa_width, out_width


def _member_widths(layer_prefix, members, params, layer_qcfg, tile_k):
    """Run the format-eligibility check on every member of a fusion group.
    Returns the common (xa_width, out_width) pair, or None when any member
    is ineligible or the widths disagree (one kernel = one width pair)."""
    widths = set()
    for m in members:
        qc = models._proj_qcfg(layer_qcfg, m.rsplit(".", 1)[-1])
        w = params[f"{layer_prefix}.{m}.weight"]
        a = params.get(f"{layer_prefix}.{m}.A")
        b = params.get(f"{layer_prefix}.{m}.B")
        ok, reason, xa_w, out_w = _eligibility(qc, w, a, b, tile_k)
        if not ok:
            return None
        widths.add((xa_w, out_w))
    return widths.pop() if len(widths) == 1 else None


def _mlp_fusable(layer_prefix, cfg, params, layer_qcfg, tile_k):
    """(xa_width, out_width) when the layer's whole MLP can run through the
    megakernel, else None."""
    gate_rel, up_rel, down_rel = mlp_members_for(cfg)
    members = [gate_rel] + ([up_rel] if up_rel else [])
    if not _fusable(layer_prefix, members + [down_rel], params, layer_qcfg):
        return None
    widths = _member_widths(layer_prefix, members + [down_rel], params,
                            layer_qcfg, tile_k)
    if widths is None:
        return None
    qc_down = models._proj_qcfg(layer_qcfg, down_rel.rsplit(".", 1)[-1])
    # the intermediate H re-quantizes IN-kernel with _quantize_rows_mx:
    # down's activation format must be the canonical MXINT one (and bf16-safe)
    if not (_is_mx8_act(qc_down.x_cfg) and qc_down.x_cfg.get("width", 99) <= 9):
        return None
    # down's contraction dim (=I) must tile, and so must its rank
    w_down = params[f"{layer_prefix}.{down_rel}.weight"]
    if _pick_tile_k(w_down.shape[1], tile_k) == 0 or w_down.shape[0] % 128 != 0:
        return None
    w_gate = params[f"{layer_prefix}.{gate_rel}.weight"]
    if w_gate.shape[0] % 128 != 0:
        return None
    return widths


def pad_to_tile(n: int, cap: int = 1024, max_overhead: float = 0.06):
    """(padded_n, tile): smallest zero-padding of ``n`` that admits a LARGE
    tile. Grid-step sequencing costs dominate small-tile kernels at decode
    shapes — 7B's I=11008 tiles at 256 (860-step MLP grid, measured ~1.8 ms
    of the ~4.1 ms kernel chain per 8 layers, round-5 probe) while padding
    2.3% to 11264 tiles at 1024 (88 steps). Zero rows/columns are exact:
    they contribute 0 to every dot and quantize to 0."""
    for t in (1024, 512, 256, 128):
        pad = -n % t
        if n >= t and pad / n <= max_overhead:
            return n + pad, t
    return n, _pick_tile_n(n)


def _pick_tile_n(n: int) -> int:
    # larger N tiles = fewer grid steps; measured ~10% on the 7B decode
    # shapes (experiments/bench_dequant_variants.py tile sweep)
    for tn in (1024, 512, 256, 128):
        if n % tn == 0:
            return tn
    raise ValueError(f"out_features {n} not divisible by a supported tile")


def _pick_tile_k(k_in: int, cap: int) -> int:
    """Largest K tile (fewest grid steps) dividing in_features: e.g. 7B's
    q/k/v/o/gate/up (K=4096) tile at 1024 while down (K=11008) tiles at 256."""
    for tk in (2048, 1024, 512, 256, 128):
        if tk <= cap and k_in % tk == 0:
            return tk
    return 0  # ineligible (caller falls back to emulation)


def _fusable(layer_prefix: str, members, params, layer_qcfg) -> bool:
    """Numerics-preserving fusion requires: identical activation-side
    quantizers across members (memoized callables ⇒ identity compare works),
    uniform A/B presence with per-member rank a multiple of the A_out group
    (16) so shared-exponent groups of the fused X·A partial never span two
    members, and per-member out_features a multiple of 16 for the same
    reason on the B_out side."""
    qcs = [models._proj_qcfg(layer_qcfg, m.rsplit(".", 1)[-1]) for m in members]
    q0 = qcs[0]
    for qc in qcs[1:]:
        if (qc.x_quantizer is not q0.x_quantizer
                or qc.a_out_quantizer is not q0.a_out_quantizer
                or qc.b_out_quantizer is not q0.b_out_quantizer):
            return False
    has_a = [params.get(f"{layer_prefix}.{m}.A") is not None for m in members]
    if any(has_a) != all(has_a):
        return False
    total_n = 0
    for m in members:
        w = params[f"{layer_prefix}.{m}.weight"]
        if w.shape[0] % 16 != 0:
            return False
        total_n += w.shape[0]
        a = params.get(f"{layer_prefix}.{m}.A")
        if a is not None and a.shape[1] % 16 != 0:
            return False
    return total_n % 128 == 0


def _fuse_members(layer_prefix: str, members, params, layer_qcfg):
    """Concatenate member weights along out_features; A along rank;
    B block-diagonally. Exact zeros in the off-diagonal B blocks keep the
    fused correction bit-identical to the per-member one (x + 0.0 == x in
    the f32 accumulator)."""
    full = [f"{layer_prefix}.{m}" for m in members]
    w = jnp.concatenate([params[p + ".weight"] for p in full], axis=0)
    bias = None
    if all(params.get(p + ".bias") is not None for p in full):
        bias = jnp.concatenate([
            models._proj_qcfg(layer_qcfg, m.rsplit(".", 1)[-1]).b_quantizer(
                params[f"{layer_prefix}.{m}.bias"])
            for m in members
        ])
    a = b = None
    if params.get(full[0] + ".A") is not None:
        a_list = [params[p + ".A"] for p in full]
        b_list = [params[p + ".B"] for p in full]
        a = jnp.concatenate(a_list, axis=1)  # (K, ΣR)
        total_r = sum(x.shape[1] for x in a_list)
        total_n = sum(x.shape[1] for x in b_list)
        b = jnp.zeros((total_r, total_n), b_list[0].dtype)
        r0 = n0 = 0
        for ai, bi in zip(a_list, b_list):
            b = b.at[r0:r0 + ai.shape[1], n0:n0 + bi.shape[1]].set(bi)
            r0 += ai.shape[1]
            n0 += bi.shape[1]
    splits = tuple(params[p + ".weight"].shape[0] for p in full)
    return w, a, b, bias, splits


def prepare_serving_params(
    params: dict,
    cfg,
    layer_qcfgs,
    tile_k: int = TILE_K,
    fuse_projections: bool = True,
    fuse_mlp: bool = True,
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

    ``fuse_projections=True`` packs q|k|v (and gate|up) as single fused
    entries (``{layer}.self_attn.qkv_proj`` / ``{layer}.mlp.gateup_proj``,
    ``meta[...]["splits"]`` holding the member out_features) — ONE kernel
    launch and one activation quantization for the group. Falls back to
    per-member packing when a group's configs/shapes don't meet the
    alignment rules (see :func:`_fusable`).
    """
    arrays: dict = {}
    meta: dict = {}
    skipped: list[str] = []

    def pack_one(key, w, a, b, bias, xa_width, out_width, splits=None):
        tk = _pick_tile_k(w.shape[1], tile_k)
        prep = prepare_w4_weights(w, a=a, b=b, bias=bias, fmt=MXINT4,
                                  tile_k=tk, tile_n=_pick_tile_n(w.shape[0]))
        # split traced arrays from static metadata so the whole backend
        # can be passed as a jit argument (tile sizes must stay static)
        arrays[key] = {k: prep[k] for k in ("tiles", "a", "b", "bias")}
        meta[key] = {
            "tile_k": tk,
            "tile_n": prep["tile_n"],
            "fmt": MXINT4,
            "xa_width": xa_width,
            "out_width": out_width,
        }
        if splits is not None:
            meta[key]["splits"] = splits

    for i in range(cfg.num_hidden_layers):
        fused_members: set[str] = set()
        lp = _layer_prefix(cfg, i)
        if fuse_mlp:
            mlp_widths = _mlp_fusable(lp, cfg, params, layer_qcfgs[i], tile_k)
            if mlp_widths is not None:
                key, members = _pack_mlp(lp, cfg, params, layer_qcfgs[i],
                                         tile_k, arrays, meta,
                                         xa_width=mlp_widths[0],
                                         out_width=mlp_widths[1])
                fused_members.update(members)
        if fuse_projections:
            for fused_rel, member_rels in fuse_groups_for(cfg):
                if any(f"{lp}.{m}" in fused_members for m in member_rels):
                    continue
                if not _fusable(lp, member_rels, params, layer_qcfgs[i]):
                    continue
                widths = _member_widths(lp, member_rels, params,
                                        layer_qcfgs[i], tile_k)
                if widths is None:
                    continue
                w, a, b, bias, splits = _fuse_members(
                    lp, member_rels, params, layer_qcfgs[i]
                )
                pack_one(f"{lp}.{fused_rel}", w, a, b, bias,
                         widths[0], widths[1], splits=splits)
                fused_members.update(f"{lp}.{m}" for m in member_rels)
        for prefix, proj in models.quantizable_module_prefixes(cfg, i):
            if prefix in fused_members:
                continue
            w = params[prefix + ".weight"]
            qc = models._proj_qcfg(layer_qcfgs[i], proj)
            a = params.get(prefix + ".A")
            b = params.get(prefix + ".B")
            ok, reason, xa_width, out_width = _eligibility(qc, w, a, b, tile_k)
            if not ok:
                skipped.append(prefix)
                if i == 0:  # one log line per distinct module, not per layer
                    logger.info(
                        "not packing %s for the Pallas backend (emulation "
                        "fallback): %s", prefix, reason)
                continue
            bias = params.get(prefix + ".bias")
            if bias is not None:
                bias = qc.b_quantizer(bias)
            pack_one(prefix, w, a, b, bias, xa_width, out_width)
    logger.info("packed %d linears for the Pallas backend (%d fell back to "
                "emulation)", len(meta), len(skipped))
    return {"arrays": arrays, "meta": meta}


def pack_lm_head(backend: dict, params: dict, width: int = 8,
                 embed_key: str | None = None) -> dict:
    """Pack the lm_head for the W8 dequant-GEMM kernel under key
    ``"lm_head"`` (serving opt-in, VERDICT r4 #2c). Only the WEIGHT stream
    is compressed (MXINT8: one int8 code + 1/16 int8 exponent per value ≈
    2.1× less HBM than bf16 — the measured dense lm_head costs ~2.9 ms
    in-situ per decode step at 7B, the single largest non-attention item);
    the activation enters unquantized in bf16, exactly like the dense
    matmul (the reference leaves lm_head fp — quality study in ROADMAP).

    ``params[embed_key or "lm_head.weight"]`` supplies the (V, K) weight
    (tied-embedding fallback). Returns ``backend`` with arrays/meta
    extended; callers that don't opt in simply never call this."""
    from ..ops.storage import MXFormat

    if embed_key is None:
        for cand in ("lm_head.weight", "model.embed_tokens.weight",
                     "model.decoder.embed_tokens.weight"):
            if cand in params:
                embed_key = cand  # untied head first, tied-embed fallback
                break
    w = params[embed_key]
    V, K = w.shape
    if V % 128 or _pick_tile_k(K, TILE_K) == 0:
        logger.info("lm_head (%d, %d) not tileable; keeping dense", V, K)
        return backend
    fmt = MXFormat(width=width)
    tk = _pick_tile_k(K, TILE_K)
    # zero-pad the vocab to a large tile (32000 tiles at 256 → a 500-step
    # grid whose sequencing overhead dominates; 32768 tiles at 1024). Pad
    # logits are sliced off in `decode._lm_head_logits` before sampling.
    v_pad, tn = pad_to_tile(V)
    if v_pad != V:
        w = jnp.pad(jnp.asarray(w), ((0, v_pad - V), (0, 0)))
    prep = prepare_w4_weights(w, fmt=fmt, tile_k=tk, tile_n=tn)
    backend["arrays"]["lm_head"] = {k: prep[k]
                                    for k in ("tiles", "a", "b", "bias")}
    backend["meta"]["lm_head"] = {
        "tile_k": tk, "tile_n": prep["tile_n"], "fmt": fmt,
        "xa_width": None, "out_width": None, "n_real": V,
    }
    return backend


def _layer_prefix(cfg, i: int) -> str:
    from ..models import llama as llama_mod
    from ..models import opt as opt_mod

    mod = opt_mod if cfg.arch == "opt" else llama_mod
    return mod.layer_prefix(i)


def _pack_mlp(lp, cfg, params, layer_qcfg, tile_k, arrays, meta,
              xa_width=8, out_width=8):
    """Pack a layer's whole MLP for the megakernel under ``{lp}.mlp_fused``
    (gate/up/down + low-rank + biases in one prep; ONE launch at decode)."""
    from ..ops.pallas.mlp_fused import prepare_mlp_weights

    gate_rel, up_rel, down_rel = mlp_members_for(cfg)
    qc_gate = models._proj_qcfg(layer_qcfg, gate_rel.rsplit(".", 1)[-1])
    qc_down = models._proj_qcfg(layer_qcfg, down_rel.rsplit(".", 1)[-1])

    def gp(rel, suffix):
        return params.get(f"{lp}.{rel}.{suffix}")

    def qbias(rel, qc):
        b = gp(rel, "bias")
        return None if b is None else qc.b_quantizer(b)

    qc_up = (models._proj_qcfg(layer_qcfg, up_rel.rsplit(".", 1)[-1])
             if up_rel else None)
    # the megakernel holds gate+up slabs + the (tile_m, I) intermediate in
    # VMEM at once: a 2048 K-tile overflows the 16 MB scoped budget
    # (measured +228 KB); cap it at 1024 (qkv/o use the full TILE_K)
    tk = _pick_tile_k(params[f"{lp}.{gate_rel}.weight"].shape[1],
                      min(tile_k, 1024))
    i_dim = params[f"{lp}.{gate_rel}.weight"].shape[0]
    i_pad, ti = pad_to_tile(i_dim)
    tk2 = _pick_tile_k(i_pad, min(tile_k, 1024))
    prep = prepare_mlp_weights(
        gp(gate_rel, "weight"),
        gp(up_rel, "weight") if up_rel else None,
        gp(down_rel, "weight"),
        a_gate=gp(gate_rel, "A"), b_gate=gp(gate_rel, "B"),
        a_up=gp(up_rel, "A") if up_rel else None,
        b_up=gp(up_rel, "B") if up_rel else None,
        a_down=gp(down_rel, "A"), b_down=gp(down_rel, "B"),
        bias_gate=qbias(gate_rel, qc_gate),
        bias_up=qbias(up_rel, qc_up) if up_rel else None,
        bias_down=qbias(down_rel, qc_down),
        fmt=MXINT4, tile_k=tk, tile_k2=tk2,
        tile_i=ti,
        tile_n=_pick_tile_n(params[f"{lp}.{down_rel}.weight"].shape[0]),
        pad_i=i_pad,
    )
    key = f"{lp}.mlp_fused"
    static = {"gated", "fmt", "tile_k", "tile_k2", "tile_i", "tile_n"}
    arrays[key] = {k: v for k, v in prep.items() if k not in static}
    meta[key] = {
        **{k: prep[k] for k in static},
        "kind": "mlp",
        "act_width": int(qc_down.x_cfg["width"]),
        "xa_width": xa_width,
        "out_width": out_width,
    }
    members = {f"{lp}.{gate_rel}", f"{lp}.{down_rel}"}
    if up_rel:
        members.add(f"{lp}.{up_rel}")
    return key, members


def serving_mlp(
    x: jnp.ndarray,  # (b, s, K)
    key: str,
    backend: dict,
    qc_first,
    qc_down,
    *,
    interpret: bool | None = None,
    layer_index=None,
) -> jnp.ndarray:
    """Run a layer's whole MLP through the megakernel: one launch for any
    token count (the kernel's grid tiles M at 128; the (tile_m, I)
    intermediate stays in VMEM per M tile). ``qc_down`` is kept for
    interface stability (its activation format is baked into the packed
    meta as ``act_width``)."""
    from ..ops.pallas.mlp_fused import mlp_w4_dense_largeM, mlp_w4_fused

    prep = dict(backend["arrays"][key])
    prep.update(backend["meta"][key])
    b, s, k = x.shape
    x_q = qc_first.x_quantizer(x).astype(jnp.bfloat16).reshape(b * s, k)
    if b * s >= _LARGEM_THRESHOLD:  # noqa: E501 (x_q re-derived below for the kernel path)
        # prefill/eval: the megakernel would refetch + re-dequantize the
        # weights once per 128-row M tile; dequant-once + XLA dense dots
        y = mlp_w4_dense_largeM(
            x_q, prep, act_width=prep["act_width"],
            quant_xa_width=prep["xa_width"],
            quant_out_width=prep["out_width"],
            out_dtype=jnp.float32, layer_index=layer_index,
        )
        return y.reshape(b, s, -1).astype(x.dtype)
    x_cfg = qc_first.x_cfg
    in_kernel_q = (_INKERNEL_XQ and _is_mx8_act(x_cfg)
                   and x_cfg.get("width", 99) <= 9 and k % 16 == 0)
    if in_kernel_q:
        x_q = x.astype(jnp.float32).reshape(b * s, k)
        qxw = int(x_cfg["width"])
    else:
        qxw = None
    y = mlp_w4_fused(
        x_q, prep, tile_m=128, tile_i=prep["tile_i"],
        tile_n=prep["tile_n"], act_width=prep["act_width"],
        quant_xa_width=prep["xa_width"], quant_out_width=prep["out_width"],
        quant_x_width=qxw,
        out_dtype=jnp.float32, interpret=interpret,
        layer_index=layer_index,
    )
    return y.reshape(b, s, -1).astype(x.dtype)


def serving_linear(
    x: jnp.ndarray,  # (b, s, in) float/bf16
    prefix: str,
    backend: dict,
    qc,
    *,
    interpret: bool | None = None,
    layer_index=None,
) -> jnp.ndarray:
    """Quantize activations (exact-in-bf16 MXINT8 emulation) then run the
    fused kernel. ``backend`` = {"arrays": {...}, "meta": {...}} from
    :func:`prepare_serving_params` (arrays may arrive traced)."""
    prep = dict(backend["arrays"][prefix])
    prep.update(backend["meta"][prefix])
    b, s, k = x.shape
    if b * s >= _LARGEM_THRESHOLD:
        from ..ops.pallas.dequant_gemm import qlinear_w4_dense_largeM

        x_q = qc.x_quantizer(x).astype(jnp.bfloat16).reshape(b * s, k)
        y = qlinear_w4_dense_largeM(
            x_q, prep,
            quant_xa_width=prep["xa_width"],
            quant_out_width=prep["out_width"],
            out_dtype=jnp.float32, layer_index=layer_index,
        )
        return y.reshape(b, s, -1).astype(x.dtype)
    # in-kernel activation quantization (opt-in, LQER_INKERNEL_XQ=1):
    # bit-identical values (K tiles split at 16-group boundaries), but the
    # quantize re-runs per (n, k) grid step — measured +150 us/layer at 7B
    # decode (the transposed 16-grouping inside every step outweighs the
    # removed XLA chains), so the default keeps the XLA x_quantizer
    x_cfg = qc.x_cfg
    in_kernel_q = (_INKERNEL_XQ and _is_mx8_act(x_cfg)
                   and x_cfg.get("width", 99) <= 9 and k % 16 == 0)
    if in_kernel_q:
        x_q = x.astype(jnp.float32).reshape(b * s, k)
        qxw = int(x_cfg["width"])
    else:
        x_q = qc.x_quantizer(x).astype(jnp.bfloat16).reshape(b * s, k)
        qxw = None
    y = qlinear_w4_fused(
        x_q,
        prep,
        tile_m=128,
        tile_n=prep["tile_n"],
        quant_xa_width=prep["xa_width"],
        quant_out_width=prep["out_width"],
        quant_x_width=qxw,
        out_dtype=jnp.float32,
        interpret=interpret,
        layer_index=layer_index,
    )
    return y.reshape(b, s, -1).astype(x.dtype)


def serving_linear_split(
    x: jnp.ndarray,
    fused_prefix: str,
    backend: dict,
    qc,
    *,
    interpret: bool | None = None,
    layer_index=None,
) -> list[jnp.ndarray]:
    """Run a fused projection group (qkv / gate|up) as one kernel launch and
    split the output back into the member projections (static split sizes
    from ``meta[...]["splits"]``)."""
    y = serving_linear(x, fused_prefix, backend, qc, interpret=interpret,
                       layer_index=layer_index)
    splits = backend["meta"][fused_prefix]["splits"]
    offsets = []
    acc = 0
    for s_ in splits[:-1]:
        acc += s_
        offsets.append(acc)
    return jnp.split(y, offsets, axis=-1)
