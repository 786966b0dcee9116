"""Cache-aware forward steps (prefill + decode) for OPT and Llama/Mistral.

New TPU-native capability (the reference evaluates fixed 2048-token chunks
only and has no incremental decoding). The same quantized math as the eval
path runs here — quantized linears with low-rank correction, quantized
QK^T/P·V — but against a static-shape KV cache, so the whole step jits once
per (batch, seq) bucket.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import models
from ..models import llama as llama_mod
from ..models import opt as opt_mod
from ..models.common import layer_norm, merge_heads, repeat_kv, rms_norm
from ..models.fp_config import FP_LAYER_LLAMA, FP_LAYER_OPT
from .kv_cache import (
    cache_code_width,
    init_kv_cache,
    init_quantized_kv_cache,
    is_quantized_cache,
    is_staged_cache,
    stage_boundary_sync,
    update_layer_cache,
    update_layer_cache_quantized,
)


def _lin(x, params, prefix, qc, backend, interpret=None):
    """Quantized linear: Pallas fused kernel when a serving backend holds a
    packed prep for this module, else the software emulation."""
    if backend is not None and prefix in backend.get("meta", {}):
        from .pallas_backend import serving_linear

        return serving_linear(x, prefix, backend, qc, interpret=interpret)
    from ..ops.qlinear import qlinear

    _m = {
        "weight": params.get(prefix + ".weight"),
        "bias": params.get(prefix + ".bias"),
        "A": params.get(prefix + ".A"),
        "B": params.get(prefix + ".B"),
    }
    return qlinear(x, _m, qc)


def _lin_group(x, params, layer_prefix, fused_rel, member_rels, qcs,
               backend, interpret=None):
    """Projections sharing one input: ONE fused kernel launch when the
    backend packed the group (`pallas_backend` fuse_projections), else
    per-member linears."""
    key = f"{layer_prefix}.{fused_rel}"
    if backend is not None and key in backend.get("meta", {}):
        from .pallas_backend import serving_linear_split

        return serving_linear_split(x, key, backend, qcs[0],
                                    interpret=interpret)
    return [
        _lin(x, params, f"{layer_prefix}.{rel}", qc, backend, interpret)
        for rel, qc in zip(member_rels, qcs)
    ]


def _mlp_fused_or_none(x, layer_prefix, qc_first, qc_down, backend,
                       interpret=None, backend_meta=None, backend_slice=None,
                       layer_index=None):
    """Whole-MLP megakernel when the backend packed it (``{p}.mlp_fused``):
    gate|up GEMMs, activation, act-quant and down GEMM in ONE launch.
    Returns None when not packed (caller runs the per-linear path).
    Scan bodies pass (backend_meta, backend_slice[=full stacked arrays],
    layer_index) instead of ``backend``."""
    key = f"{layer_prefix}.mlp_fused" if layer_prefix else "mlp_fused"
    if backend_slice is not None and key in backend_slice:
        from .pallas_backend import serving_mlp

        one = {"arrays": {key: backend_slice[key]},
               "meta": {key: backend_meta[key]}}
        return serving_mlp(x, key, one, qc_first, qc_down,
                           layer_index=layer_index)
    if backend is not None and key in backend.get("meta", {}):
        from .pallas_backend import serving_mlp

        return serving_mlp(x, key, backend, qc_first, qc_down,
                           interpret=interpret)
    return None


def _last_valid_h(h, valid_lengths, s, logits_last_only):
    """(b, s, e) → (b, 1, e) at the last valid position per slot (admission
    only needs one next-token distribution; the full-sequence lm_head costs
    GBs of f32 logits at 7B admission scale)."""
    if not logits_last_only or s == 1:
        return h
    if valid_lengths is None:
        return h[:, -1:, :]
    b, _, e = h.shape
    idx = jnp.clip(valid_lengths - 1, 0, s - 1)[:, None, None]
    return jnp.take_along_axis(h, jnp.broadcast_to(idx, (b, 1, e)), axis=1)


def _lm_head_logits(h, lm_head, backend, interpret=None):
    """Final logits: packed-W8 dequant-GEMM kernel when the backend packed
    ``lm_head`` (`pallas_backend.pack_lm_head` — the dense bf16 matmul costs
    ~2.9 ms in-situ per 7B decode step, ~2.1× the weight stream of W8),
    else the dense matmul. The activation enters unquantized (bf16 cast,
    same as the dense path); only the weight grid changes."""
    if backend is not None and "lm_head" in backend.get("meta", {}):
        from ..ops.pallas.dequant_gemm import qlinear_w4_fused

        prep = dict(backend["arrays"]["lm_head"])
        prep.update(backend["meta"]["lm_head"])
        n_real = prep.pop("n_real", None)
        b, s, k = h.shape
        from ..serving.pallas_backend import _LARGEM_THRESHOLD

        if b * s >= _LARGEM_THRESHOLD:
            from ..ops.pallas.dequant_gemm import qlinear_w4_dense_largeM

            y = qlinear_w4_dense_largeM(
                h.astype(jnp.bfloat16).reshape(b * s, k), prep,
                quant_xa_width=None, quant_out_width=None)
        else:
            y = qlinear_w4_fused(
                h.astype(jnp.bfloat16).reshape(b * s, k), prep,
                quant_xa_width=None, quant_out_width=None,
                interpret=interpret,
            )
        if n_real is not None and y.shape[-1] != n_real:
            y = y[:, :n_real]  # vocab zero-padded for large tiles
        return y.reshape(b, s, -1).astype(h.dtype)
    return jnp.matmul(h, lm_head.T)


def _heads(y, num_heads):
    b, s, _ = y.shape
    return y.reshape(b, s, num_heads, -1).transpose(0, 2, 1, 3)


def _abs_positions(positions: jnp.ndarray, s: int) -> jnp.ndarray:
    return positions[:, None] + jnp.arange(s)[None, :]  # (b, s)


def _cache_mask(q_abs: jnp.ndarray, max_len: int, dtype,
                window: int | None = None) -> jnp.ndarray:
    """(b, 1, s, max_len): query at absolute pos p sees cache slots <= p;
    with ``window`` (Mistral sliding-window attention,
    `mistral_decoder.py` / `_sliding_window_mask` in models.llama) only the
    last ``window`` slots."""
    k_idx = jnp.arange(max_len)[None, None, :]
    q = q_abs[:, :, None]
    ok = k_idx <= q
    if window is not None:
        ok = ok & (k_idx > q - window)
    return jnp.where(ok, 0.0, jnp.finfo(dtype).min).astype(dtype)[:, None, :, :]


def _kv_skip_matmuls(attn_cfg):
    """Quantize-once-at-write matmuls for the MXINT8 cache: K/V enter the
    dots as stored (the cache's [1,16]-d-group MXINT8 format IS the operand
    format), so the w-side quantizer is passthrough; q/probs quantize as
    configured. Resolution happens at trace time and `make_quantizer` is
    memoized, so this costs nothing per step."""
    from ..ops.qlinear import resolve_qmatmul

    def strip(cfg):
        if cfg is None:
            return None
        return {**cfg, "w_quantizer": {"name": "passthrough"}}

    return (resolve_qmatmul(strip(attn_cfg.qk_cfg)),
            resolve_qmatmul(strip(attn_cfg.pv_cfg)))


_KV_MISMATCH_WARNED = set()


def _kv_config_is_cache_format(attn_cfg, width: int = 8) -> bool:
    """True when the configured K/V-side operand quantizers coincide with
    the quantized cache's write format ([1,16]-group block_fp at the
    cache's code width — 8 for mxint8, 4 for the round-5 mxint4 cache) —
    only then is the quantize-once-at-write skip semantics-preserving. Any
    other K/V config over a quantized cache keeps its configured use-time
    quantizers (applied on the cache-decoded values: write-grid then
    configured grid, the same double-quantization a narrower storage format
    implies), so reported accuracy always reflects the config."""
    from ..models.common import _std_a8

    qk, pv = attn_cfg.qk_cfg, attn_cfg.pv_cfg
    if qk is None or pv is None:
        # fp attention config: no K/V-side quantizer to skip; treating the
        # stored grid as the operand is exact.
        return qk is None and pv is None
    kx = qk.get("w_quantizer") or qk.get("default")
    vx = pv.get("w_quantizer") or pv.get("default")
    ok = all(_std_a8(c) and c.get("width") == width for c in (kx, vx))
    if not ok:
        key = (str(kx), str(vx))
        if key not in _KV_MISMATCH_WARNED:
            _KV_MISMATCH_WARNED.add(key)
            import logging

            logging.getLogger(__name__).warning(
                "mxint8 KV cache with non-MXINT8 K/V operand quantizers "
                "(%s / %s): the configured quantizers run on the "
                "cache-decoded values (double quantization)", kx, vx)
    return ok


def _attend(qh, k_l, v_l, mask, attn_cfg, scaling, n_rep, scale_query,
            kv_pre_quantized=False, cache_width=8):
    """Cache attention with quantized matmuls on 3-D (b·h, ...) operands,
    matching the reference's reshape-before-quantize layout
    (`llama_decoder.py:261-263`) so shared-exponent blocks never span heads.

    Exact parity with the chunked eval path relies on invalid cache slots
    being zero: K^T quantization groups run along the token axis, and zeros
    neither raise a group's absmax nor requantize to non-zero.

    K/V arrive in the CACHE dtype (bf16 for serving): the quantizers upcast
    to f32 internally and their output grids are bf16-exact, so skipping the
    f32 materialization of the whole cache changes nothing numerically while
    halving the attention-path HBM traffic.

    ``kv_pre_quantized``: the MXINT8-cache path — K/V are already in the
    cache's operand format (quantized once at write), so the K/V-side
    operand quantizers are skipped (see `kv_cache.init_quantized_kv_cache`).
    """
    if kv_pre_quantized and _kv_config_is_cache_format(attn_cfg,
                                                       cache_width):
        qk_matmul, pv_matmul = _kv_skip_matmuls(attn_cfg)
    else:
        qk_matmul, pv_matmul = attn_cfg.qk_matmul, attn_cfg.pv_matmul
    k_full = repeat_kv(k_l, n_rep)
    v_full = repeat_kv(v_l, n_rep)
    b, h, s, d = qh.shape
    kv_len = k_full.shape[2]
    q3 = qh.reshape(b * h, s, d)
    k3 = k_full.reshape(b * h, kv_len, d)
    v3 = v_full.reshape(b * h, kv_len, d)
    if scale_query:
        q3 = q3 * scaling
        scores = qk_matmul(q3, jnp.swapaxes(k3, -1, -2))
    else:
        scores = qk_matmul(q3, jnp.swapaxes(k3, -1, -2)) * scaling
    scores = scores.reshape(b, h, s, kv_len) + mask
    scores = jnp.maximum(scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(qh.dtype)
    out = pv_matmul(probs.reshape(b * h, s, kv_len), v3)
    return out.reshape(b, h, s, d)


def _fp_cache_kernel_fits(max_len, head_dim, itemsize) -> bool:
    """fp-cache analogue of `decode_attention._kvh_chunk_fits` (ADVICE r4):
    the fp kernel has no streaming-L variant, and `_kvh_chunk` bottoms out
    at chunk=1 — one head's double-buffered whole-L K+V block must fit the
    12 MB VMEM budget or the kernel fails at compile. Beyond the wall the
    caller keeps the eager path."""
    return 2 * max_len * head_dim * itemsize * 2 <= 12 * 1024 * 1024


def _use_attn_kernel(backend, s, attn_cfg, max_len, head_dim,
                     cache=None) -> bool:
    """Fused decode-attention eligibility: serving (Pallas backend) decode
    step with the canonical MXINT attention formats and 16-aligned dims.
    ``LQER_DISABLE_ATTN_KERNEL=1`` forces the eager path (A/B testing).
    ``LQER_FP_ATTN_KERNEL=1`` additionally routes UNQUANTIZED (fp config)
    decode attention through the kernel with all operand quantizers off —
    XLA's eager bf16-cache attention streams at ~216 GB/s vs the kernel's
    ~365 (measured round 4; it is the dense baseline's dominant cost), but
    the kernel's f32 accumulation order differs from the XLA dot's, so the
    fp mode stays opt-in rather than silently perturbing exact-token
    tests."""
    import os

    if os.environ.get("LQER_DISABLE_ATTN_KERNEL"):
        return False
    # below ~128 cache slots the eager path's whole-cache quantize is cheap
    # and the kernel's per-(slot, head) program overhead dominates (measured
    # crossover on v5e, experiments/bench_e2e_llama7b.py)
    if s != 1 or max_len < 128 or max_len % 16 != 0 or head_dim % 16 != 0:
        return False
    if cache is not None and not is_quantized_cache(cache):
        # fp cache: the fp kernel has no streaming-L fallback (ADVICE r4)
        itemsize = jnp.dtype(cache["k"].dtype).itemsize
        if not _fp_cache_kernel_fits(max_len, head_dim, itemsize):
            return False
    if attn_cfg.qk_cfg is None and attn_cfg.pv_cfg is None:
        return bool(os.environ.get("LQER_FP_ATTN_KERNEL"))
    if backend is None:
        return False
    from ..ops.pallas.decode_attention import supports_decode_attention

    cw = cache_code_width(cache) if (cache is not None
                                     and is_quantized_cache(cache)) else 8
    return supports_decode_attention(attn_cfg, cache_width=cw)


def _attend_auto(qh, k_l, v_l, mask, attn_cfg, scaling, n_rep, scale_query,
                 positions, window, use_kernel, interpret=None,
                 quant_slices=None, layer_index=None,
                 kv_pre_quantized=False, fp_stacked=None, cache_width=8):
    """Decode attention: fused Pallas kernel (per-head cache-resident,
    q/probs quantization in-kernel) when eligible, else the eager path.

    ``quant_slices``: the layer's MXINT8 cache slices
    ({k,v}_{codes,exps}, post-update) — the kernel then decodes the cache IN
    VMEM (8.5-bit HBM stream) instead of consuming the pre-decoded ``k_l``/
    ``v_l``, whose decode XLA dead-code-eliminates.

    ``fp_stacked``: (k, v) FULL layer-stacked fp cache arrays — the fp-cache
    kernel reads them in place via ``layer_index`` (scan bodies; slicing
    would materialize the layer copy).

    ``kv_pre_quantized``: the cache is MXINT8 — its format is the operand
    format, so the eager fallback skips its K/V-side quantizers (the
    quantized-cache kernel's semantics, `_kv_skip_matmuls`)."""
    if use_kernel:
        from ..ops.pallas.decode_attention import (
            decode_attention,
            decode_attention_quantized,
            decode_attention_widths,
            decode_attention_widths_quantized,
        )

        if quant_slices is not None:
            L = quant_slices["k_codes"].shape[-1]
            d = qh.shape[-1]
            # whole-L per-head VMEM residency wall (see _kvh_chunk): beyond
            # it, stream L in chunks (two-pass kernel; K read twice)
            from ..ops.pallas.decode_attention import (
                _kvh_chunk_fits,
                decode_attention_quantized_streaming,
                streaming_l_chunk,
            )

            if not _kvh_chunk_fits(L, d):
                lc = streaming_l_chunk(L)
                assert lc is not None, (L, "no group-multiple l_chunk")
                return decode_attention_quantized_streaming(
                    qh, quant_slices["k_codes"], quant_slices["k_exps"],
                    quant_slices["v_codes"], quant_slices["v_exps"],
                    positions, scaling=scaling, scale_query=scale_query,
                    window=window, interpret=interpret,
                    layer_index=layer_index, l_chunk=lc,
                    **decode_attention_widths_quantized(attn_cfg),
                )
            return decode_attention_quantized(
                qh, quant_slices["k_codes"], quant_slices["k_exps"],
                quant_slices["v_codes"], quant_slices["v_exps"],
                positions, scaling=scaling, scale_query=scale_query,
                window=window, interpret=interpret,
                layer_index=layer_index,
                **decode_attention_widths_quantized(attn_cfg),
            )
        if fp_stacked is not None:
            return decode_attention(
                qh, fp_stacked[0], fp_stacked[1], positions, scaling=scaling,
                scale_query=scale_query, window=window, interpret=interpret,
                layer_index=layer_index,
                **decode_attention_widths(attn_cfg),
            )
        return decode_attention(
            qh, k_l, v_l, positions, scaling=scaling,
            scale_query=scale_query, window=window, interpret=interpret,
            **decode_attention_widths(attn_cfg),
        )
    return _attend(qh, k_l, v_l, mask, attn_cfg, scaling, n_rep, scale_query,
                   kv_pre_quantized=kv_pre_quantized,
                   cache_width=cache_width)


def _fresh_prefill_attend(qh, kh, vh, attn_cfg, scaling, n_rep, scale_query,
                          cache, window):
    """ADMISSION prefill attention (positions all 0, cache fresh-zeroed —
    the engine passes ``fresh_prefill=True`` statically): causal attention
    over the prompt chunk through the fused prefill kernel instead of the
    eager path, whose (nb·h, s, max_len) f32 score/probs/quantizer temps
    dominate HBM at large admission batches (ROADMAP round 4). Returns None
    when ineligible (sliding window, non-canonical formats, unaligned
    dims) — the caller falls back to the eager path.

    Semantics match the eager path per cache flavor: MXINT8 cache → K/V
    enter as their write-time operand grid (quantize-once-at-write,
    `_kv_skip_matmuls`); fp cache → K^T token-axis + V quantization inside
    the helper. Exact up to the kernel's tile accumulation order (the same
    contract as the eval-through-kernels forward)."""
    from ..models.common import (
        fused_quantized_attention,
        repeat_kv,
        supports_fused_attention,
    )

    quantized = is_quantized_cache(cache)
    if window is not None or not supports_fused_attention(
            attn_cfg, kv_pre_quantized=quantized):
        return None
    b, h, s, d = qh.shape
    if d % 16 or s % 16 or s < 16:
        return None
    if quantized:
        cw = cache_code_width(cache)
        if not _kv_config_is_cache_format(attn_cfg, cw):
            return None  # eager fallback applies the configured quantizers
        from ..parallel.collectives import (
            mx4_decode, mx4_encode, mx8_decode, mx8_encode,
        )
        from .kv_cache import cache_group

        g = cache_group(cache)
        if d % g:
            return None
        enc = mx4_encode if cw == 4 else mx8_encode
        dec = mx4_decode if cw == 4 else mx8_decode
        # the cache's write-time roundtrip IS the attention operand
        kr = dec(*enc(kh, g, zero_fill=1.0), g, jnp.bfloat16)
        vr = dec(*enc(vh, g, zero_fill=1.0), g, jnp.bfloat16)
    else:
        kr, vr = kh, vh
    return fused_quantized_attention(
        qh, repeat_kv(kr, n_rep), repeat_kv(vr, n_rep), attn_cfg, scaling,
        scale_query=scale_query, kv_values_pre_quantized=quantized,
    )


def _fused_write_attend(cache, qh, kh, vh, positions, li, attn_cfg, scaling,
                        scale_query, window, use_ak, max_len, head_dim):
    """Single-launch cache-insert + decode attention for the scan path
    (quantized cache, one-pass regime): returns (attn, updated cache) or
    None when ineligible (fp cache / eager / streaming-L). Bitwise equal to
    write-then-attend (`decode_attention_quantized_write`)."""
    if not use_ak or "k_codes" not in cache or max_len % 128 != 0:
        return None
    if cache_code_width(cache) != 8:
        return None  # W4 caches route through the staged or two-launch path
    from ..ops.pallas.decode_attention import (
        _kvh_chunk_fits,
        decode_attention_quantized_write,
        decode_attention_widths_quantized,
    )

    if not _kvh_chunk_fits(max_len, head_dim):
        return None  # streaming-L regime keeps the two-launch path
    attn, kc2, ke2, vc2, ve2 = decode_attention_quantized_write(
        qh, cache["k_codes"], cache["k_exps"], cache["v_codes"],
        cache["v_exps"], kh, vh, positions, li,
        scaling=scaling, scale_query=scale_query, window=window,
        **decode_attention_widths_quantized(attn_cfg),
    )
    return attn, {**cache, "k_codes": kc2, "k_exps": ke2,
                  "v_codes": vc2, "v_exps": ve2}


_STAGE_KEYS = ("k_stage_codes", "k_stage_exps",
               "v_stage_codes", "v_stage_exps")
_MAIN_KEYS = ("k_codes", "k_exps", "v_codes", "v_exps")


def _staged_write_attend(cache, qh, kh, vh, positions, li, attn_cfg, scaling,
                         scale_query, window, use_ak, max_len, head_dim):
    """Single-launch ring-staged write + combined attend (round 5): the
    fresh token lands in the SW-lane staging ring inside the attention
    kernel (static-index aliased outputs) and attention combines main cache
    + ring flash-style. Returns (attn, cache) or None when the kernel is
    ineligible — the caller then runs the eager staged path (the cache
    format is fixed at creation; a staged cache NEVER takes the direct
    main-window write)."""
    from .kv_cache import is_staged_cache

    if not is_staged_cache(cache) or window is not None or not use_ak:
        return None
    from ..ops.pallas.decode_attention import (
        _kvh_chunk_fits,
        decode_attention_quantized_staged,
        decode_attention_quantized_streaming_staged,
        decode_attention_widths_quantized,
        streaming_l_chunk,
    )

    widths = decode_attention_widths_quantized(attn_cfg)
    if _kvh_chunk_fits(max_len, head_dim):
        attn, ks, ke, vs, ve = decode_attention_quantized_staged(
            qh, *(cache[k] for k in _MAIN_KEYS),
            *(cache[k] for k in _STAGE_KEYS),
            kh, vh, positions, cache["flushed"], li,
            scaling=scaling, scale_query=scale_query, **widths,
        )
    else:
        # streaming-L regime (round 5, VERDICT r4 #5): two-pass chunked
        # attention with the staging write folded into pass 1 — a single
        # logical step, no direct main-window RMW
        lc = streaming_l_chunk(max_len)
        assert lc is not None, (max_len, "no group-multiple l_chunk")
        attn, ks, ke, vs, ve = decode_attention_quantized_streaming_staged(
            qh, *(cache[k] for k in _MAIN_KEYS),
            *(cache[k] for k in _STAGE_KEYS),
            kh, vh, positions, cache["flushed"], li,
            scaling=scaling, scale_query=scale_query, l_chunk=lc, **widths,
        )
    return attn, {**cache, "k_stage_codes": ks, "k_stage_exps": ke,
                  "v_stage_codes": vs, "v_stage_exps": ve}


def _staged_eager_update(cache, li, kh, vh, positions, compute_dtype):
    """Eager staged decode write + views (s == 1): encode the fresh token
    into the staging ring (XLA per-slot lane DUS), then materialize the
    layer's (b, kv_heads, max_len, d) K/V views as main-cache decode with
    columns [flushed, pos] overridden from the ring (tile + where — ring
    lane j == token % SW). Semantically identical to the staged kernel; the
    kernel's HBM savings don't apply (this path exists for
    LQER_DISABLE_ATTN_KERNEL A/B and backend-less engines)."""
    from ..parallel.collectives import (
        mx4_decode, mx4_encode, mx8_decode, mx8_encode,
    )
    from .kv_cache import cache_group

    group = cache_group(cache)
    cw = cache_code_width(cache)
    enc = mx4_encode if cw == 4 else mx8_encode
    mxdec = mx4_decode if cw == 4 else mx8_decode
    SW = cache["k_stage_codes"].shape[-1]
    L = cache["k_codes"].shape[-1]
    r = positions % SW
    k_c, k_e = enc(kh, group, zero_fill=1.0)  # (B, KVH, 1, d[/g][/2])
    v_c, v_e = enc(vh, group, zero_fill=1.0)
    news = {"k_stage_codes": jnp.swapaxes(k_c, -1, -2),
            "k_stage_exps": jnp.swapaxes(k_e, -1, -2),
            "v_stage_codes": jnp.swapaxes(v_c, -1, -2),
            "v_stage_exps": jnp.swapaxes(v_e, -1, -2)}

    def upd_t(c, n, p):
        return jax.lax.dynamic_update_slice(c, n, (0, 0, p))

    out = dict(cache)
    for key, n in news.items():
        sl = jax.vmap(upd_t)(cache[key][li], n, r)
        out[key] = cache[key].at[li].set(sl)

    def views(ck, ek):
        dec = mxdec(jnp.swapaxes(out[ck[0]][li], -1, -2),
                    jnp.swapaxes(out[ck[1]][li], -1, -2),
                    group, compute_dtype)               # (B, KVH, L, d)
        st = mxdec(jnp.swapaxes(out[ek[0]][li], -1, -2),
                   jnp.swapaxes(out[ek[1]][li], -1, -2),
                   group, compute_dtype)                # (B, KVH, SW, d)
        tiled = jnp.tile(st, (1, 1, L // SW, 1))
        col = jnp.arange(L)[None, :]
        valid = (col >= out["flushed"][:, None]) & \
            (col <= positions[:, None])
        return jnp.where(valid[:, None, :, None], tiled, dec)

    k_l = views(("k_codes", "k_exps"), ("k_stage_codes", "k_stage_exps"))
    v_l = views(("v_codes", "v_exps"), ("v_stage_codes", "v_stage_exps"))
    return out, k_l, v_l


def _staged_flush_maybe(cache, positions):
    """Flush prologue for staged-cache decode steps: when any slot's ring
    residue reaches 48, migrate every slot's completed 32-blocks into the
    main cache (ONE two-launch window RMW across all layers,
    `cache_write.flush_stage_to_main`). Trigger at 48 (not 32) so the flush
    runs once per ≥17 steps while the residue stays < SW=64 by
    construction (decode advances every slot by at most 1 per step)."""
    from ..ops.pallas.cache_write import flush_stage_to_main
    from .kv_cache import is_staged_cache

    if not is_staged_cache(cache):
        return cache

    def do_flush(c):
        nf = (positions // 32) * 32
        arrays = flush_stage_to_main(
            tuple(c[k] for k in _MAIN_KEYS),
            tuple(c[k] for k in _STAGE_KEYS),
            c["flushed"], nf)
        return {**c, **dict(zip(_MAIN_KEYS, arrays)), "flushed": nf}

    pred = jnp.any(positions - cache["flushed"] >= 48)
    return jax.lax.cond(pred, do_flush, lambda c: c, cache)


def _quant_slices(cache, use_kernel):
    """FULL layer-stacked MXINT8 cache arrays for the quantized-cache
    kernel (the kernel selects the layer via scalar-prefetch layer_index —
    slicing here would make XLA materialize a copy of the whole layer's
    cache, the dominant decode stream), or None (fp cache / ineligible)."""
    if not use_kernel or not is_quantized_cache(cache):
        return None
    return {k: cache[k] for k in ("k_codes", "k_exps", "v_codes", "v_exps")}


def model_step(
    params: dict,
    input_ids: jnp.ndarray,  # (b, s)
    cache: dict,
    positions: jnp.ndarray,  # (b,) current write offset per sequence
    cfg,
    layer_qcfgs: list | None = None,
    backend: dict | None = None,
    interpret: bool | None = None,
    valid_lengths: jnp.ndarray | None = None,
    fresh_prefill: bool = False,
    logits_last_only: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """Run s tokens through the model updating the cache; returns
    (logits (b, s, vocab), cache). Works for prefill (s>1) and decode (s=1).

    ``logits_last_only``: at prefill, compute the lm_head only for the last
    valid position per slot (returns (b, 1, vocab)) — admission needs one
    next-token distribution per sequence, and the full (b, s, vocab) f32
    logits cost 2.1 GB + ~4 TFLOP at 7B × 8 × 2048 (the round-5 HBM OOM).

    ``backend``: packed Pallas serving params (see
    :mod:`lqer_tpu.serving.pallas_backend`); None = software emulation.

    ``valid_lengths`` (b,): during right-padded prefill, the number of real
    tokens per sequence — K/V writes beyond it are zeroed so padding garbage
    never lands in the cache (it would perturb the shared-exponent groups of
    later K^T quantization even though the mask hides it from attention).
    """
    if cfg.arch == "opt":
        return _opt_step(params, input_ids, cache, positions, cfg, layer_qcfgs,
                         backend, interpret, valid_lengths, fresh_prefill,
                         logits_last_only)
    return _llama_step(params, input_ids, cache, positions, cfg, layer_qcfgs,
                       backend, interpret, valid_lengths, fresh_prefill,
                       logits_last_only)


def _kv_valid_mask(valid_lengths, s):
    if valid_lengths is None:
        return None
    return (jnp.arange(s)[None, :] < valid_lengths[:, None])  # (b, s)


def _llama_step(params, input_ids, cache, positions, cfg, layer_qcfgs,
                backend=None, interpret=None, valid_lengths=None,
                fresh_prefill=False, logits_last_only=False):

    b, s = input_ids.shape
    max_len = _cache_max_len(cache)
    if s == 1:
        cache = _staged_flush_maybe(cache, positions)  # staged cache only
    embed = params["model.embed_tokens.weight"]
    h = jnp.take(embed, input_ids, axis=0)

    q_abs = _abs_positions(positions, s)
    mask = _cache_mask(q_abs, max_len, h.dtype,
                       window=getattr(cfg, "sliding_window", None))
    kv_valid = _kv_valid_mask(valid_lengths, s)
    cos, sin = llama_mod.rotary_tables(
        cfg.head_dim, max(max_len, cfg.max_position_embeddings), cfg.rope_theta
    )
    n_rep = cfg.num_attention_heads // cfg.kv_heads

    window = getattr(cfg, "sliding_window", None)
    for i in range(cfg.num_hidden_layers):
        q = layer_qcfgs[i] if layer_qcfgs is not None else FP_LAYER_LLAMA
        attn_cfg = q["attn"]
        use_ak = _use_attn_kernel(backend, s, attn_cfg, max_len, cfg.head_dim,
                                  cache=cache)
        p = llama_mod.layer_prefix(i)
        _m = llama_mod._mod

        residual = h
        hn = rms_norm(h, _m(params, f"{p}.input_layernorm"), cfg.rms_norm_eps)
        qy, ky, vy = _lin_group(
            hn, params, p, "self_attn.qkv_proj",
            ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
            (attn_cfg.q_proj, attn_cfg.k_proj, attn_cfg.v_proj),
            backend, interpret,
        )
        qh = _heads(qy, cfg.num_attention_heads)
        kh = _heads(ky, cfg.kv_heads)
        vh = _heads(vy, cfg.kv_heads)
        qh, kh = llama_mod.apply_rotary(qh, kh, cos, sin, q_abs)

        if kv_valid is not None:
            kh = kh * kv_valid[:, None, :, None]
            vh = vh * kv_valid[:, None, :, None]
        pre = (_fresh_prefill_attend(qh, kh, vh, attn_cfg,
                                     cfg.head_dim**-0.5, n_rep, False,
                                     cache, window)
               if fresh_prefill and s > 1 else None)
        if s == 1 and is_staged_cache(cache):
            st = _staged_write_attend(
                cache, qh, kh, vh, positions,
                jnp.asarray([i], jnp.int32), attn_cfg,
                cfg.head_dim**-0.5, False, window, use_ak, max_len,
                cfg.head_dim)
            if st is not None:
                attn, cache = st
            else:
                cache, k_l, v_l = _staged_eager_update(
                    cache, i, kh, vh, positions, h.dtype)
                attn = _attend_auto(
                    qh, k_l, v_l, mask, attn_cfg, cfg.head_dim**-0.5,
                    n_rep, False, positions, window, False, interpret,
                    kv_pre_quantized=True,
                    cache_width=cache_code_width(cache))
        else:
            cache, k_l, v_l = _cache_update(cache, i, kh, vh, positions,
                                            h.dtype)
            attn = pre if pre is not None else _attend_auto(
                qh, k_l, v_l, mask, attn_cfg, cfg.head_dim**-0.5,
                n_rep, False, positions, window, use_ak, interpret,
                quant_slices=_quant_slices(cache, use_ak),
                layer_index=jnp.asarray([i], jnp.int32),
                kv_pre_quantized=is_quantized_cache(cache),
                cache_width=cache_code_width(cache)
                if is_quantized_cache(cache) else 8)
        attn = _lin(merge_heads(attn), params, f"{p}.self_attn.o_proj",
                    attn_cfg.o_proj, backend, interpret)
        h = residual + attn

        residual = h
        hn = rms_norm(h, _m(params, f"{p}.post_attention_layernorm"),
                      cfg.rms_norm_eps)
        y = _mlp_fused_or_none(hn, p, q["gate_proj"], q["down_proj"],
                               backend, interpret)
        if y is None:
            gate, up = _lin_group(
                hn, params, p, "mlp.gateup_proj",
                ("mlp.gate_proj", "mlp.up_proj"),
                (q["gate_proj"], q["up_proj"]),
                backend, interpret,
            )
            y = _lin(jax.nn.silu(gate) * up, params,
                     f"{p}.mlp.down_proj", q["down_proj"],
                     backend, interpret)
        h = residual + y

    h = rms_norm(h, llama_mod._mod(params, "model.norm"), cfg.rms_norm_eps)
    h = _last_valid_h(h, valid_lengths, s, logits_last_only)
    lm_head = params.get("lm_head.weight", embed)
    if s > 1 and is_staged_cache(cache):
        new_pos = positions + (valid_lengths if valid_lengths is not None
                               else s)
        cache = stage_boundary_sync(cache, new_pos)
    return _lm_head_logits(h, lm_head, backend, interpret), cache


def _opt_step(params, input_ids, cache, positions, cfg, layer_qcfgs,
              backend=None, interpret=None, valid_lengths=None,
              fresh_prefill=False, logits_last_only=False):

    b, s = input_ids.shape
    max_len = _cache_max_len(cache)
    if s == 1:
        cache = _staged_flush_maybe(cache, positions)  # staged cache only
    embed = params["model.decoder.embed_tokens.weight"]
    h = jnp.take(embed, input_ids, axis=0)
    if params.get("model.decoder.project_in.weight") is not None:  # OPT-350m
        h = jnp.matmul(h, params["model.decoder.project_in.weight"].T)
    q_abs = _abs_positions(positions, s)
    h = h + jnp.take(
        params["model.decoder.embed_positions.weight"], q_abs + 2, axis=0
    )
    mask = _cache_mask(q_abs, max_len, h.dtype)
    kv_valid = _kv_valid_mask(valid_lengths, s)

    for i in range(cfg.num_hidden_layers):
        q = layer_qcfgs[i] if layer_qcfgs is not None else FP_LAYER_OPT
        attn_cfg = q["attn"]
        use_ak = _use_attn_kernel(backend, s, attn_cfg, max_len, cfg.head_dim,
                                  cache=cache)
        p = opt_mod.layer_prefix(i)
        _m = opt_mod._mod

        residual = h
        hn = layer_norm(h, _m(params, f"{p}.self_attn_layer_norm")) \
            if cfg.do_layer_norm_before else h
        qy, ky, vy = _lin_group(
            hn, params, p, "self_attn.qkv_proj",
            ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
            (attn_cfg.q_proj, attn_cfg.k_proj, attn_cfg.v_proj),
            backend, interpret,
        )
        qh = _heads(qy, cfg.num_attention_heads)
        kh = _heads(ky, cfg.num_attention_heads)
        vh = _heads(vy, cfg.num_attention_heads)
        if kv_valid is not None:
            kh = kh * kv_valid[:, None, :, None]
            vh = vh * kv_valid[:, None, :, None]
        pre = (_fresh_prefill_attend(qh, kh, vh, attn_cfg,
                                     cfg.head_dim**-0.5, 1, True,
                                     cache, None)
               if fresh_prefill and s > 1 else None)
        if s == 1 and is_staged_cache(cache):
            st = _staged_write_attend(
                cache, qh, kh, vh, positions,
                jnp.asarray([i], jnp.int32), attn_cfg,
                cfg.head_dim**-0.5, True, None, use_ak, max_len,
                cfg.head_dim)
            if st is not None:
                attn, cache = st
            else:
                cache, k_l, v_l = _staged_eager_update(
                    cache, i, kh, vh, positions, h.dtype)
                attn = _attend_auto(
                    qh, k_l, v_l, mask, attn_cfg, cfg.head_dim**-0.5,
                    1, True, positions, None, False, interpret,
                    kv_pre_quantized=True,
                    cache_width=cache_code_width(cache))
        else:
            cache, k_l, v_l = _cache_update(cache, i, kh, vh, positions,
                                            h.dtype)
            attn = pre if pre is not None else _attend_auto(
                qh, k_l, v_l, mask, attn_cfg, cfg.head_dim**-0.5,
                1, True, positions, None, use_ak, interpret,
                quant_slices=_quant_slices(cache, use_ak),
                layer_index=jnp.asarray([i], jnp.int32),
                kv_pre_quantized=is_quantized_cache(cache),
                cache_width=cache_code_width(cache)
                if is_quantized_cache(cache) else 8)
        attn = _lin(merge_heads(attn), params, f"{p}.self_attn.out_proj",
                    attn_cfg.o_proj, backend, interpret)
        h = residual + attn
        if not cfg.do_layer_norm_before:
            h = layer_norm(h, _m(params, f"{p}.self_attn_layer_norm"))

        residual = h
        hn = layer_norm(h, _m(params, f"{p}.final_layer_norm")) \
            if cfg.do_layer_norm_before else h
        y = _mlp_fused_or_none(hn, p, q["fc1"], q["fc2"], backend, interpret)
        if y is None:
            y = _lin(hn, params, f"{p}.fc1", q["fc1"], backend, interpret)
            y = jax.nn.relu(y)
            y = _lin(y, params, f"{p}.fc2", q["fc2"], backend, interpret)
        h = residual + y
        if not cfg.do_layer_norm_before:
            h = layer_norm(h, _m(params, f"{p}.final_layer_norm"))

    if params.get("model.decoder.final_layer_norm.weight") is not None:
        h = layer_norm(h, opt_mod._mod(params, "model.decoder.final_layer_norm"))
    if params.get("model.decoder.project_out.weight") is not None:
        h = jnp.matmul(h, params["model.decoder.project_out.weight"].T)
    h = _last_valid_h(h, valid_lengths, s, logits_last_only)
    lm_head = params.get("lm_head.weight", embed)
    if s > 1 and is_staged_cache(cache):
        new_pos = positions + (valid_lengths if valid_lengths is not None
                               else s)
        cache = stage_boundary_sync(cache, new_pos)
    return _lm_head_logits(h, lm_head, backend, interpret), cache


def make_cache(cfg, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
    """``dtype="mxint8"`` selects the quantized cache (8.5 bits/value);
    ``"mxint8-staged"`` additionally ring-stages decode writes (round 5 —
    requires max_len % 128 == 0 and no sliding window); ``"mxint4"`` /
    ``"mxint4-staged"`` select the 4.5-bit cache (half the attention
    stream; K/V operand quantizers must be width 4 — quality study in
    experiments/kv_cache_quality.py)."""
    kv_heads = cfg.kv_heads if hasattr(cfg, "kv_heads") else cfg.num_attention_heads
    if dtype in ("mxint4", "mxint4-staged"):
        assert cfg.head_dim % 32 == 0, cfg.head_dim
        staged4 = dtype.endswith("-staged") and \
            getattr(cfg, "sliding_window", None) is None and \
            max_len % 128 == 0
        return init_quantized_kv_cache(
            cfg.num_hidden_layers, batch, kv_heads, cfg.head_dim, max_len,
            staged=staged4, code_width=4,
        )
    if dtype == "mxint8-staged":
        eligible = (getattr(cfg, "sliding_window", None) is None
                    and max_len % 128 == 0)
        if not eligible:
            # sliding-window / unaligned regimes keep the direct-write
            # quantized cache (the staged kernels don't cover them); plain
            # mxint8 is semantically identical. Streaming-L IS covered
            # (decode_attention_quantized_streaming_staged).
            import logging

            logging.getLogger(__name__).info(
                "mxint8-staged ineligible (window=%s, max_len=%d): using "
                "the direct-write mxint8 cache",
                getattr(cfg, "sliding_window", None), max_len)
            return init_quantized_kv_cache(
                cfg.num_hidden_layers, batch, kv_heads, cfg.head_dim,
                max_len)
        return init_quantized_kv_cache(
            cfg.num_hidden_layers, batch, kv_heads, cfg.head_dim, max_len,
            staged=True,
        )
    if dtype == "mxint8":
        return init_quantized_kv_cache(
            cfg.num_hidden_layers, batch, kv_heads, cfg.head_dim, max_len
        )
    return init_kv_cache(
        cfg.num_hidden_layers, batch, kv_heads, cfg.head_dim, max_len, dtype
    )


def _cache_update(cache, layer, kh, vh, positions, compute_dtype):
    del compute_dtype  # MXINT8 values are exact in bf16; decode to bf16 to
    # halve the attention-path traffic (quantizers upcast internally)
    if is_quantized_cache(cache):
        return update_layer_cache_quantized(
            cache, layer, kh, vh, positions, jnp.bfloat16
        )
    return update_layer_cache(cache, layer, kh, vh, positions)


# ---------------------------------------------------------------------------
# lax.scan decode step (compile-time scaling for deep models)
# ---------------------------------------------------------------------------
LLAMA_REL_KEYS = (
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
)


def stack_backend(backend: dict, cfg, consume: bool = False) -> dict | None:
    """Prefix-keyed Pallas backend → rel-keyed stacked arrays (L, ...) for the
    scan body, with layer-0 metadata (uniform layers required). The rel-key
    set is derived from what the backend actually packed, so fused entries
    (qkv_proj / gateup_proj) stack the same way.

    ``consume``: drop each per-prefix array from ``backend["arrays"]`` as it
    is stacked, so the device holds ~one copy of the packed weights instead
    of two (per-prefix + stacked ≈ 2×2.2 GB at 7B — part of the 8-slot 2048
    admission OOM budget, round 4). Only for callers that won't reuse the
    per-prefix backend (a scan-layers engine)."""
    if backend is None:
        return None
    import jax.numpy as _jnp

    arch_mod = opt_mod if cfg.arch == "opt" else llama_mod
    p0 = arch_mod.layer_prefix(0) + "."
    rels = [k[len(p0):] for k in backend["meta"] if k.startswith(p0)]
    arrays = {}
    meta = {}
    for rel in rels:
        per_layer = []
        for i in range(cfg.num_hidden_layers):
            prefix = f"{arch_mod.layer_prefix(i)}.{rel}"
            per_layer.append(backend["arrays"][prefix])
            if backend["meta"][prefix] != backend["meta"][p0 + rel]:
                raise ValueError(
                    f"scan_layers requires uniform per-layer packing; "
                    f"{prefix} differs from layer 0"
                )
        arrays[rel] = {
            k: (None if per_layer[0][k] is None
                else _jnp.stack([p[k] for p in per_layer]))
            for k in per_layer[0]
        }
        meta[rel] = backend["meta"][p0 + rel]
        if consume:
            del per_layer
            for i in range(cfg.num_hidden_layers):
                backend["arrays"].pop(f"{arch_mod.layer_prefix(i)}.{rel}",
                                      None)
    # non-layer entries (e.g. the packed "lm_head") carry over unstacked
    for k in backend["meta"]:
        if not k.startswith(arch_mod.layer_prefix(0)[:
                            arch_mod.layer_prefix(0).rfind(".")]):
            arrays[k] = backend["arrays"][k]
            meta[k] = backend["meta"][k]
    return {"arrays": arrays, "meta": meta}


def _lin_slice(x, sl, rel, qc, backend_meta, backend_arrays,
               layer_index=None):
    """Linear inside the scan body: Pallas kernel when the backend packed
    the module, else emulated qlinear on the stacked-param slice.

    ``backend_arrays[rel]`` holds the FULL layer-stacked kernel operands
    (leading L dim) and ``layer_index`` selects the layer via the kernel's
    scalar-prefetch path — threading a per-layer slice through scan xs makes
    XLA materialize a multi-MB copy per layer (see dequant_gemm._fused_call).
    ``layer_index=None`` keeps the legacy per-layer-slice behavior."""
    if backend_arrays is not None and rel in backend_arrays:
        from .pallas_backend import serving_linear

        one = {"arrays": {rel: backend_arrays[rel]},
               "meta": {rel: backend_meta[rel]}}
        return serving_linear(x, rel, one, qc, layer_index=layer_index)
    from ..ops.qlinear import qlinear

    m = {k: sl.get(f"{rel}.{k}") for k in ("weight", "bias", "A", "B")}
    return qlinear(x, m, qc)


def _lin_group_slice(x, sl, fused_rel, member_rels, qcs,
                     backend_meta, backend_arrays, layer_index=None):
    """Scan-body analogue of :func:`_lin_group`: one fused launch when the
    stacked backend holds the fused entry, else per-member linears."""
    if backend_meta is not None and fused_rel in backend_meta:
        from .pallas_backend import serving_linear_split

        one = {"arrays": {fused_rel: backend_arrays[fused_rel]},
               "meta": {fused_rel: backend_meta[fused_rel]}}
        return serving_linear_split(x, fused_rel, one, qcs[0],
                                    layer_index=layer_index)
    return [
        _lin_slice(x, sl, rel, qc, backend_meta, backend_arrays,
                   layer_index=layer_index)
        for rel, qc in zip(member_rels, qcs)
    ]


def _cache_write_full(cache, li, kh, vh, positions):
    """Write the new K/V entries for layer ``li`` (traced scalar) directly
    into the FULL layer-stacked cache carried through the scan: per-slot
    dynamic_update_slice of just the new rows. Replaces the xs→ys cache
    threading, whose per-layer slices XLA materialized as whole-layer
    copies when they fed a pallas kernel (cache is the dominant decode
    stream — see dequant_gemm._fused_call for the root cause)."""
    B = kh.shape[0]
    s = kh.shape[2]
    quantized = "k_codes" in cache
    if quantized:
        from .kv_cache import cache_group

        group = cache_group(cache)
        cw = cache_code_width(cache)
        if s == 1 and cw == 8 and cache["k_codes"].shape[-1] % 128 == 0:
            # fused encode+write: ONE aliased Pallas call quantizes the new
            # rows in-kernel and blends them into the aligned windows — the
            # XLA-side mx8_encode + (…, d, 1) swapaxes relayouts alone cost
            # ~0.14 ms/layer (bench_step_split, round 4), the old DUS chain
            # ~0.84 ms/layer.
            from ..ops.pallas.cache_write import write_kv_tokens_fused

            keys = ("k_codes", "k_exps", "v_codes", "v_exps")
            updated = write_kv_tokens_fused(
                tuple(cache[k] for k in keys), kh, vh, li, positions,
                group=group)
            out = dict(cache)
            out.update(dict(zip(keys, updated)))
            return out
        from ..parallel.collectives import mx4_encode, mx8_encode

        enc = mx4_encode if cw == 4 else mx8_encode
        k_c, k_e = enc(kh, group, zero_fill=1.0)
        v_c, v_e = enc(vh, group, zero_fill=1.0)
        # codes AND exps stored transposed: token axis last
        # (see init_quantized_kv_cache)
        news = {"k_codes": jnp.swapaxes(k_c, -1, -2),
                "k_exps": jnp.swapaxes(k_e, -1, -2),
                "v_codes": jnp.swapaxes(v_c, -1, -2),
                "v_exps": jnp.swapaxes(v_e, -1, -2)}
    else:
        news = {"k": kh, "v": vh}

    def tok_dim(key):  # cache dim holding the token axis
        return 3 if key in ("k", "v") else 4

    aligned = all(
        cache[k].shape[tok_dim(k)] % (32 if k in ("k", "v") else 128) == 0
        for k in news
    )
    if s == 1 and aligned:
        # one aliased in-place Pallas write per layer — the DUS chain below
        # costs ~0.84 ms/layer on real HW (see ops/pallas/cache_write.py)
        from ..ops.pallas.cache_write import write_kv_rows_stacked

        keys = sorted(news)
        updated = write_kv_rows_stacked(
            tuple(cache[k] for k in keys), tuple(news[k] for k in keys),
            li, positions)
        out = dict(cache)
        out.update(dict(zip(keys, updated)))
        return out
    out = dict(cache)
    zero = jnp.int32(0)
    for key, new in news.items():
        arr = out[key]
        for b in range(B):
            blk = new[b][None, None].astype(arr.dtype)  # (1,1,kvh,·,·)
            start = [li, jnp.int32(b), zero, zero, zero]
            start[tok_dim(key)] = positions[b]
            arr = jax.lax.dynamic_update_slice(arr, blk, tuple(start))
        out[key] = arr
    return out


def _cache_layer_views(cache, li):
    """Decoded (k_l, v_l) bf16 views of layer ``li`` for the eager / fp
    attention paths (the quantized-cache kernel never calls this — it reads
    the stacked codes in place)."""
    take = lambda a: jax.lax.dynamic_index_in_dim(  # noqa: E731
        a, li, 0, keepdims=False)
    if "k_codes" in cache:
        from ..parallel.collectives import mx4_decode, mx8_decode
        from .kv_cache import cache_group

        group = cache_group(cache)
        dec = mx4_decode if cache_code_width(cache) == 4 else mx8_decode
        k_l = dec(jnp.swapaxes(take(cache["k_codes"]), -1, -2),
                  jnp.swapaxes(take(cache["k_exps"]), -1, -2),
                  group, jnp.bfloat16)
        v_l = dec(jnp.swapaxes(take(cache["v_codes"]), -1, -2),
                  jnp.swapaxes(take(cache["v_exps"]), -1, -2),
                  group, jnp.bfloat16)
        return k_l, v_l
    return take(cache["k"]), take(cache["v"])


def _cache_max_len(cache: dict) -> int:
    # quantized layout is token-axis-LAST (codes (…, d, L)); fp is (…, L, d)
    if is_quantized_cache(cache):
        return cache["k_codes"].shape[-1]
    return cache["k"].shape[3]


def _q_segments(layer_qcfg, num_layers: int, default_q: dict):
    """Normalize ``layer_qcfg`` (None | one dict | per-layer list) into
    [(start, end, q)] segments of identical resolved configs."""
    if layer_qcfg is None:
        return [(0, num_layers, default_q)]
    if isinstance(layer_qcfg, dict):
        return [(0, num_layers, layer_qcfg)]
    from ..models.config_expand import layer_qcfg_segments

    return layer_qcfg_segments(list(layer_qcfg), num_layers)


def _scan_segments(make_body, segments, h, stacked, cache, num_layers):
    """Run the layer scan per config segment (one traced body per distinct
    run of per-layer configs — the reference's ``model_layer_{i}`` surface,
    `llama_decoder.py:423-482`), re-joining the cache slices.

    Backend kernel operands do NOT thread through scan xs — the body closes
    over the full stacked arrays and xs carries only the absolute layer
    index, which the kernels consume via scalar prefetch (no per-layer
    slice copies; see dequant_gemm._fused_call)."""
    idxs = jnp.arange(num_layers, dtype=jnp.int32)[:, None]
    if len(segments) == 1:
        _, _, q = segments[0]
        (h, cache), _ = jax.lax.scan(make_body(q), (h, cache),
                                     (stacked, idxs))
        return h, cache

    def sl(tree, s, e):
        return jax.tree_util.tree_map(lambda a: a[s:e], tree)

    for s, e, q in segments:
        (h, cache), _ = jax.lax.scan(make_body(q), (h, cache),
                                     (sl(stacked, s, e), idxs[s:e]))
    return h, cache


def llama_step_scan(
    params: dict,
    input_ids: jnp.ndarray,
    cache: dict,
    positions: jnp.ndarray,
    cfg,
    layer_qcfg: dict | list | None,
    stacked: dict | None = None,
    rest: dict | None = None,
    backend_stacked: dict | None = None,
    valid_lengths: jnp.ndarray | None = None,
    fresh_prefill: bool = False,
    logits_last_only: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """`model_step` for Llama with the layer loop as lax.scan: ONE trace of
    the decoder layer regardless of depth (the 4-layer engine warmup already
    costs minutes of compile through this environment's relay; 32-80 layer
    models need this). The KV cache (fp or MXINT8-quantized) threads through
    scan as xs→ys: each step consumes its layer's cache slice and emits the
    updated slice.

    ``layer_qcfg`` may be one config (uniform layers) or the full per-layer
    list: heterogeneous ``model_layer_{i}`` overrides scan per config
    segment (one traced body per distinct run of configs).
    """
    from ..models.fp_config import FP_LAYER_LLAMA

    if stacked is None or rest is None:
        stacked, rest = llama_mod.stack_layer_params(params, cfg)
    segments = _q_segments(layer_qcfg, cfg.num_hidden_layers, FP_LAYER_LLAMA)

    b, s = input_ids.shape
    max_len = _cache_max_len(cache)
    if s == 1:
        cache = _staged_flush_maybe(cache, positions)  # staged cache only
    embed = rest["model.embed_tokens.weight"]
    h = jnp.take(embed, input_ids, axis=0)
    h_dtype = h.dtype
    q_abs = _abs_positions(positions, s)
    mask = _cache_mask(q_abs, max_len, h.dtype,
                       window=getattr(cfg, "sliding_window", None))
    kv_valid = _kv_valid_mask(valid_lengths, s)
    cos, sin = llama_mod.rotary_tables(
        cfg.head_dim, max(max_len, cfg.max_position_embeddings), cfg.rope_theta
    )
    n_rep = cfg.num_attention_heads // cfg.kv_heads
    b_meta = None if backend_stacked is None else backend_stacked["meta"]

    def rel_mod(sl, rel):
        return {k: sl.get(f"{rel}.{k}") for k in ("weight", "bias", "A", "B")}

    def make_body(q):
        attn_cfg = q["attn"]
        use_ak = _use_attn_kernel(backend_stacked, s, attn_cfg, max_len,
                                  cfg.head_dim, cache=cache)

        def body(carry, xs):
            h, cache = carry
            sl, li = xs
            residual = h
            hn = rms_norm(h, rel_mod(sl, "input_layernorm"), cfg.rms_norm_eps)
            qy, ky, vy = _lin_group_slice(
                hn, sl, "self_attn.qkv_proj",
                ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
                (attn_cfg.q_proj, attn_cfg.k_proj, attn_cfg.v_proj),
                b_meta, b_arrays, layer_index=li,
            )
            qh = _heads(qy, cfg.num_attention_heads)
            kh = _heads(ky, cfg.kv_heads)
            vh = _heads(vy, cfg.kv_heads)
            qh, kh = llama_mod.apply_rotary(qh, kh, cos, sin, q_abs)
            if kv_valid is not None:
                kh = kh * kv_valid[:, None, :, None]
                vh = vh * kv_valid[:, None, :, None]

            pre = (_fresh_prefill_attend(
                qh, kh, vh, attn_cfg, cfg.head_dim**-0.5, n_rep, False,
                cache, getattr(cfg, "sliding_window", None))
                if fresh_prefill and s > 1 else None)
            staged = None if (pre is not None or s != 1) else \
                _staged_write_attend(
                    cache, qh, kh, vh, positions, li, attn_cfg,
                    cfg.head_dim**-0.5, False,
                    getattr(cfg, "sliding_window", None), use_ak, max_len,
                    cfg.head_dim)
            fused = None if (pre is not None or staged is not None
                             or is_staged_cache(cache)) else \
                _fused_write_attend(
                    cache, qh, kh, vh, positions, li, attn_cfg,
                    cfg.head_dim**-0.5, False,
                    getattr(cfg, "sliding_window", None), use_ak, max_len,
                    cfg.head_dim)
            if pre is not None:
                cache = _cache_write_full(cache, li[0], kh, vh, positions)
                attn = pre
            elif staged is not None:
                attn, cache = staged
            elif s == 1 and is_staged_cache(cache):
                cache, k_l, v_l = _staged_eager_update(
                    cache, li[0], kh, vh, positions, h.dtype)
                attn = _attend_auto(
                    qh, k_l, v_l, mask, attn_cfg, cfg.head_dim**-0.5,
                    n_rep, False, positions,
                    getattr(cfg, "sliding_window", None), False,
                    kv_pre_quantized=True,
                    cache_width=cache_code_width(cache))
            elif fused is not None:
                attn, cache = fused
            else:
                cache = _cache_write_full(cache, li[0], kh, vh, positions)
                use_qk = use_ak and "k_codes" in cache
                if use_ak:
                    k_l = v_l = None  # kernels read the stacked cache
                else:
                    k_l, v_l = _cache_layer_views(cache, li[0])
                attn = _attend_auto(
                    qh, k_l, v_l, mask, attn_cfg, cfg.head_dim**-0.5,
                    n_rep, False, positions,
                    getattr(cfg, "sliding_window", None), use_ak,
                    quant_slices=_quant_slices(cache, use_qk),
                    layer_index=li,
                    kv_pre_quantized="k_codes" in cache,
                    cache_width=cache_code_width(cache)
                    if "k_codes" in cache else 8,
                    fp_stacked=None if use_qk or not use_ak
                    else (cache["k"], cache["v"]))
            attn = _lin_slice(merge_heads(attn), sl, "self_attn.o_proj",
                              attn_cfg.o_proj, b_meta, b_arrays,
                              layer_index=li)
            h = residual + attn

            residual = h
            hn = rms_norm(h, rel_mod(sl, "post_attention_layernorm"),
                          cfg.rms_norm_eps)
            y = _mlp_fused_or_none(hn, None, q["gate_proj"], q["down_proj"],
                                   None, backend_meta=b_meta,
                                   backend_slice=b_arrays, layer_index=li)
            if y is None:
                gate, up = _lin_group_slice(
                    hn, sl, "mlp.gateup_proj",
                    ("mlp.gate_proj", "mlp.up_proj"),
                    (q["gate_proj"], q["up_proj"]),
                    b_meta, b_arrays, layer_index=li,
                )
                y = _lin_slice(jax.nn.silu(gate) * up, sl,
                               "mlp.down_proj", q["down_proj"], b_meta,
                               b_arrays, layer_index=li)
            h = residual + y
            # kernels emit f32; pin the carry to the stream dtype (bf16
            # embeddings => bf16 residual stream, the dense-serving norm)
            return (h.astype(h_dtype), cache), None

        return body

    b_arrays = None if backend_stacked is None else backend_stacked["arrays"]
    h, cache = _scan_segments(make_body, segments, h, stacked, cache,
                              cfg.num_hidden_layers)

    h = rms_norm(h, {"weight": rest["model.norm.weight"],
                     "bias": rest.get("model.norm.bias")}, cfg.rms_norm_eps)
    h = _last_valid_h(h, valid_lengths, s, logits_last_only)
    lm_head = rest.get("lm_head.weight", embed)
    if s > 1 and is_staged_cache(cache):
        new_pos = positions + (valid_lengths if valid_lengths is not None
                               else s)
        cache = stage_boundary_sync(cache, new_pos)
    return _lm_head_logits(h, lm_head, backend_stacked), cache


def opt_step_scan(
    params: dict,
    input_ids: jnp.ndarray,
    cache: dict,
    positions: jnp.ndarray,
    cfg,
    layer_qcfg: dict | None,
    stacked: dict | None = None,
    rest: dict | None = None,
    backend_stacked: dict | None = None,
    valid_lengths: jnp.ndarray | None = None,
    fresh_prefill: bool = False,
    logits_last_only: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """OPT analogue of :func:`llama_step_scan` (same xs→ys cache threading,
    fp or MXINT8-quantized; heterogeneous per-layer configs scan per config
    segment). Pre-LN and post-LN (`do_layer_norm_before`) variants both
    supported; project_in/out (OPT-350m) live in ``rest``."""
    from ..models.fp_config import FP_LAYER_OPT

    if stacked is None or rest is None:
        stacked, rest = opt_mod.stack_layer_params(params, cfg)
    segments = _q_segments(layer_qcfg, cfg.num_hidden_layers, FP_LAYER_OPT)

    b, s = input_ids.shape
    max_len = _cache_max_len(cache)
    if s == 1:
        cache = _staged_flush_maybe(cache, positions)  # staged cache only
    embed = rest["model.decoder.embed_tokens.weight"]
    h = jnp.take(embed, input_ids, axis=0)
    h_dtype = h.dtype
    if rest.get("model.decoder.project_in.weight") is not None:  # OPT-350m
        h = jnp.matmul(h, rest["model.decoder.project_in.weight"].T)
    q_abs = _abs_positions(positions, s)
    h = h + jnp.take(
        rest["model.decoder.embed_positions.weight"], q_abs + 2, axis=0
    )
    mask = _cache_mask(q_abs, max_len, h.dtype)
    kv_valid = _kv_valid_mask(valid_lengths, s)
    b_meta = None if backend_stacked is None else backend_stacked["meta"]

    def rel_mod(sl, rel):
        return {k: sl.get(f"{rel}.{k}") for k in ("weight", "bias", "A", "B")}

    def make_body(q):
        attn_cfg = q["attn"]
        use_ak = _use_attn_kernel(backend_stacked, s, attn_cfg, max_len,
                                  cfg.head_dim, cache=cache)

        def body(carry, xs):
            h, cache = carry
            sl, li = xs
            residual = h
            hn = layer_norm(h, rel_mod(sl, "self_attn_layer_norm")) \
                if cfg.do_layer_norm_before else h
            qy, ky, vy = _lin_group_slice(
                hn, sl, "self_attn.qkv_proj",
                ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
                (attn_cfg.q_proj, attn_cfg.k_proj, attn_cfg.v_proj),
                b_meta, b_arrays, layer_index=li,
            )
            qh = _heads(qy, cfg.num_attention_heads)
            kh = _heads(ky, cfg.num_attention_heads)
            vh = _heads(vy, cfg.num_attention_heads)
            if kv_valid is not None:
                kh = kh * kv_valid[:, None, :, None]
                vh = vh * kv_valid[:, None, :, None]

            pre = (_fresh_prefill_attend(
                qh, kh, vh, attn_cfg, cfg.head_dim**-0.5, 1, True,
                cache, None)
                if fresh_prefill and s > 1 else None)
            staged = None if (pre is not None or s != 1) else \
                _staged_write_attend(
                    cache, qh, kh, vh, positions, li, attn_cfg,
                    cfg.head_dim**-0.5, True, None, use_ak, max_len,
                    cfg.head_dim)
            fused = None if (pre is not None or staged is not None
                             or is_staged_cache(cache)) else \
                _fused_write_attend(
                    cache, qh, kh, vh, positions, li, attn_cfg,
                    cfg.head_dim**-0.5, True, None, use_ak, max_len,
                    cfg.head_dim)
            if pre is not None:
                cache = _cache_write_full(cache, li[0], kh, vh, positions)
                attn = pre
            elif staged is not None:
                attn, cache = staged
            elif s == 1 and is_staged_cache(cache):
                cache, k_l, v_l = _staged_eager_update(
                    cache, li[0], kh, vh, positions, h.dtype)
                attn = _attend_auto(
                    qh, k_l, v_l, mask, attn_cfg, cfg.head_dim**-0.5, 1,
                    True, positions, None, False,
                    kv_pre_quantized=True,
                    cache_width=cache_code_width(cache))
            elif fused is not None:
                attn, cache = fused
            else:
                cache = _cache_write_full(cache, li[0], kh, vh, positions)
                use_qk = use_ak and "k_codes" in cache
                if use_ak:
                    k_l = v_l = None  # kernels read the stacked cache
                else:
                    k_l, v_l = _cache_layer_views(cache, li[0])
                attn = _attend_auto(
                    qh, k_l, v_l, mask, attn_cfg, cfg.head_dim**-0.5, 1,
                    True, positions, None, use_ak,
                    quant_slices=_quant_slices(cache, use_qk),
                    layer_index=li,
                    kv_pre_quantized="k_codes" in cache,
                    cache_width=cache_code_width(cache)
                    if "k_codes" in cache else 8,
                    fp_stacked=None if use_qk or not use_ak
                    else (cache["k"], cache["v"]))
            attn = _lin_slice(merge_heads(attn), sl, "self_attn.out_proj",
                              attn_cfg.o_proj, b_meta, b_arrays,
                              layer_index=li)
            h = residual + attn
            if not cfg.do_layer_norm_before:
                h = layer_norm(h, rel_mod(sl, "self_attn_layer_norm"))

            residual = h
            hn = layer_norm(h, rel_mod(sl, "final_layer_norm")) \
                if cfg.do_layer_norm_before else h
            y = _mlp_fused_or_none(hn, None, q["fc1"], q["fc2"], None,
                                   backend_meta=b_meta, backend_slice=b_arrays,
                                   layer_index=li)
            if y is None:
                y = _lin_slice(hn, sl, "fc1", q["fc1"], b_meta, b_arrays,
                               layer_index=li)
                y = jax.nn.relu(y)
                y = _lin_slice(y, sl, "fc2", q["fc2"], b_meta, b_arrays,
                               layer_index=li)
            h = residual + y
            if not cfg.do_layer_norm_before:
                h = layer_norm(h, rel_mod(sl, "final_layer_norm"))
            # kernels emit f32; pin the carry to the stream dtype (bf16
            # embeddings => bf16 residual stream, the dense-serving norm)
            return (h.astype(h_dtype), cache), None

        return body

    b_arrays = None if backend_stacked is None else backend_stacked["arrays"]
    h, cache = _scan_segments(make_body, segments, h, stacked, cache,
                              cfg.num_hidden_layers)

    if rest.get("model.decoder.final_layer_norm.weight") is not None:
        h = layer_norm(h, opt_mod._mod(rest, "model.decoder.final_layer_norm"))
    if rest.get("model.decoder.project_out.weight") is not None:
        h = jnp.matmul(h, rest["model.decoder.project_out.weight"].T)
    h = _last_valid_h(h, valid_lengths, s, logits_last_only)
    lm_head = rest.get("lm_head.weight", embed)
    if s > 1 and is_staged_cache(cache):
        new_pos = positions + (valid_lengths if valid_lengths is not None
                               else s)
        cache = stage_boundary_sync(cache, new_pos)
    return _lm_head_logits(h, lm_head, backend_stacked), cache
