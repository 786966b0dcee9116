"""Static-shape KV cache for decode.

The reference has no serving path at all (SURVEY.md §1: "no serving layer");
this is new TPU-native capability. Caches are preallocated to ``max_len``
(static shapes for XLA) and updated with ``lax.dynamic_update_slice`` under
``vmap`` (per-sequence write offsets), so mixed-progress slots — the basis of
continuous batching — are first-class.

Sharding: cache tensors are (L, b, kv_heads, max_len, d); under a (dp, tp)
mesh the kv_heads axis shards with "tp" alongside the attention heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_kv_cache(
    num_layers: int,
    batch: int,
    kv_heads: int,
    head_dim: int,
    max_len: int,
    dtype=jnp.bfloat16,
) -> dict:
    shape = (num_layers, batch, kv_heads, max_len, head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def update_layer_cache(
    cache: dict,
    layer: int,
    k_new: jnp.ndarray,  # (b, kv_heads, s, d)
    v_new: jnp.ndarray,
    positions: jnp.ndarray,  # (b,) per-sequence write offsets
) -> tuple[dict, jnp.ndarray, jnp.ndarray]:
    """Write new entries; returns (cache, k_layer, v_layer) where the layer
    views are post-update (b, kv_heads, max_len, d)."""

    def upd(c, n, p):  # (h, max_len, d), (h, s, d), scalar
        return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), (0, p, 0))

    k_l = jax.vmap(upd)(cache["k"][layer], k_new, positions)
    v_l = jax.vmap(upd)(cache["v"][layer], v_new, positions)
    cache = {
        "k": cache["k"].at[layer].set(k_l),
        "v": cache["v"].at[layer].set(v_l),
    }
    return cache, k_l, v_l


def decode_mask(
    lengths: jnp.ndarray,  # (b,) tokens in cache INCLUDING the current one
    max_len: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(b, 1, 1, max_len) additive mask over cache positions."""
    k_idx = jnp.arange(max_len)[None, :]
    ok = k_idx < lengths[:, None]
    mask = jnp.where(ok, 0.0, jnp.finfo(dtype).min).astype(dtype)
    return mask[:, None, None, :]


def prefill_mask(
    seq_len: int,
    lengths: jnp.ndarray,  # (b,) valid prompt lengths (right-padded batch)
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(b, 1, s, s) causal mask with right-padding masked out."""
    q = jnp.arange(seq_len)[:, None]
    k = jnp.arange(seq_len)[None, :]
    causal = (k <= q)[None]
    valid = k[None] < lengths[:, None, None]
    ok = causal & valid
    return jnp.where(ok, 0.0, jnp.finfo(dtype).min).astype(dtype)[:, None, :, :]


# ---------------------------------------------------------------------------
# MXINT8-quantized KV cache
# ---------------------------------------------------------------------------
def init_quantized_kv_cache(
    num_layers: int,
    batch: int,
    kv_heads: int,
    head_dim: int,
    max_len: int,
    group: int = 16,
    staged: bool = False,
    stage_width: int = 64,
    code_width: int = 8,
) -> dict:
    """KV cache stored as MXINT8 codes + per-16-group int8 exponents:
    8.5 bits/value vs 16 for bf16 (~1.9x cache memory/bandwidth saving).

    K/V are quantized per (token, d-group) at INSERT time and that format IS
    the attention-operand format (quantize-once-at-write, round 4): QK^T and
    P·V consume the stored values directly with no use-time K/V
    re-quantization — one FEWER lossy step than round 3's
    cache-format-then-requantize semantics, and the decode-attention kernel
    becomes a pure streaming decode (see
    `ops.pallas.decode_attention._kernel_quantized_body`).

    Both codes and exponents are stored TRANSPOSED — token axis LAST:
    codes (…, head_dim, max_len), exps (…, head_dim/group, max_len).
    Two reasons (both measured in round 3/4):
      * the d-group structure lands on SUBLANES, so the in-kernel decode is
        one sublane-split reshape + broadcast multiply — the round-3
        (L, d)-codes layout forced two full-cache f32 transposes per head
        (Mosaic cannot reshape lane groups);
      * an 8-wide minor dim ((max_len, d/group) exps) makes XLA prefer a
        swapped-minor-dims layout while Pallas requires the default one —
        every kernel call paid two ~33 MB layout-conversion copies
        (~160 us/layer, bench_attention_probe `write`).
    """
    assert head_dim % group == 0, (head_dim, group)
    assert code_width in (4, 8), code_width
    # MXINT4 cache (round 5, opt-in KV4): codes nibble-packed along the d
    # axis (d-split: packed row i = value i | value i+d/2 << 4 — unpack is
    # two shifts + a sublane concat), 4.5 bits/value. Quality study:
    # experiments/kv_cache_quality.py; the write grid IS the operand grid
    # (quantize-once-at-write at width 4).
    code_rows = head_dim if code_width == 8 else head_dim // 2
    shape_c = (num_layers, batch, kv_heads, code_rows, max_len)
    shape_e = (num_layers, batch, kv_heads, head_dim // group, max_len)
    z8 = jnp.zeros(shape_c, jnp.int8)
    ze = jnp.zeros(shape_e, jnp.int8)
    # group size is derivable from the shapes (codes dim / exps dim), so the
    # cache stays a pure array pytree (ints would become traced under jit)
    out = {"k_codes": z8, "k_exps": ze,
           "v_codes": jnp.zeros_like(z8), "v_exps": jnp.zeros_like(ze)}
    if staged:
        # ring-staged write (round 5): decode tokens land in an SW-lane
        # staging ring (tiny static-index RMW); completed 32-blocks migrate
        # into the main cache once per ~16-32 steps
        # (`cache_write.flush_stage_to_main`) instead of every step's
        # 128-lane window RMW (~35 MB/layer to store 64 KB — the measured
        # round-5 write cost). ``flushed``: per-slot 32-aligned boundary —
        # positions [0, flushed) live in main, [flushed, pos] in the ring.
        assert max_len % 128 == 0 and 128 % stage_width == 0 \
            and stage_width % (2 * group) == 0, (max_len, stage_width)
        sc = (num_layers, batch, kv_heads, code_rows, stage_width)
        se = (num_layers, batch, kv_heads, head_dim // group, stage_width)
        out.update({
            "k_stage_codes": jnp.zeros(sc, jnp.int8),
            "k_stage_exps": jnp.zeros(se, jnp.int8),
            "v_stage_codes": jnp.zeros(sc, jnp.int8),
            "v_stage_exps": jnp.zeros(se, jnp.int8),
            "flushed": jnp.zeros((batch,), jnp.int32),
        })
    return out


def cache_group(cache: dict) -> int:
    """Quantization group of a quantized cache (always 16: codes rows are
    d for the W8 layout or d/2 for the nibble-packed W4 layout, exps rows
    are d/16 either way)."""
    r = cache["k_codes"].shape[-2] // cache["k_exps"].shape[-2]
    return 16 if r in (8, 16) else r


def cache_code_width(cache: dict) -> int:
    """8 (one int8 code per value) or 4 (two codes per byte, d-split)."""
    r = cache["k_codes"].shape[-2] // cache["k_exps"].shape[-2]
    return 4 if r == 8 else 8


def is_quantized_cache(cache: dict) -> bool:
    return "k_codes" in cache


def is_staged_cache(cache: dict) -> bool:
    return "k_stage_codes" in cache


_STAGE_PAIRS = (("k_codes", "k_stage_codes"), ("k_exps", "k_stage_exps"),
                ("v_codes", "v_stage_codes"), ("v_exps", "v_stage_exps"))


def stage_boundary_sync(cache: dict, new_positions: jnp.ndarray,
                        slot_mask: jnp.ndarray | None = None) -> dict:
    """After a PREFILL wrote tokens [0, new_positions) into the MAIN cache,
    establish the staged invariant: ``flushed = floor32(new_positions)`` and
    the boundary tokens [flushed, new_positions) copied into the staging
    ring (lane = token % SW) — the staged attention kernel reads positions
    >= flushed exclusively from the ring. ``slot_mask`` restricts the sync
    to admitted slots (continuing slots keep their state)."""
    SW = cache["k_stage_codes"].shape[-1]
    L = cache["k_codes"].shape[-1]
    B = new_positions.shape[0]
    fl = (new_positions // 32) * 32
    if slot_mask is None:
        slot_mask = jnp.ones((B,), bool)
    j = jnp.arange(SW)[None, :]
    t = fl[:, None] + jnp.remainder(j - fl[:, None], SW)        # (B, SW)
    valid = (t < new_positions[:, None]) & slot_mask[:, None]
    tc = jnp.clip(t, 0, L - 1)
    out = dict(cache)
    for main_key, stage_key in _STAGE_PAIRS:
        main = cache[main_key]                                   # (NL,B,KVH,r,L)
        idx = jnp.broadcast_to(tc[None, :, None, None, :],
                               main.shape[:-1] + (SW,))
        gathered = jnp.take_along_axis(main, idx, axis=-1)
        out[stage_key] = jnp.where(valid[None, :, None, None, :],
                                   gathered, cache[stage_key])
    out["flushed"] = jnp.where(slot_mask, fl, cache["flushed"])
    return out


def update_layer_cache_quantized(
    cache: dict,
    layer: int,
    k_new: jnp.ndarray,  # (b, kv_heads, s, d)
    v_new: jnp.ndarray,
    positions: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> tuple[dict, jnp.ndarray, jnp.ndarray]:
    """Quantize the new entries, write codes+exponents (token axis last for
    both), return the decoded post-update layer views
    (b, kv_heads, max_len, d)."""
    from ..parallel.collectives import (
        mx4_decode,
        mx4_encode,
        mx8_decode,
        mx8_encode,
    )

    group = cache_group(cache)
    w4 = cache_code_width(cache) == 4
    enc = mx4_encode if w4 else mx8_encode
    dec = mx4_decode if w4 else mx8_decode
    # zero_fill=1.0: deterministic all-zero-group exponent so the fused
    # Pallas cache-write kernel (per-slot view, no global min) produces
    # byte-identical caches (`cache_write.write_kv_tokens_fused`)
    k_c, k_e = enc(k_new, group, zero_fill=1.0)
    v_c, v_e = enc(v_new, group, zero_fill=1.0)

    def upd_t(c, n, p):  # token axis last (codes and exps alike)
        return jax.lax.dynamic_update_slice(c, n, (0, 0, p))

    kc_l = jax.vmap(upd_t)(cache["k_codes"][layer],
                           jnp.swapaxes(k_c, -1, -2), positions)
    ke_l = jax.vmap(upd_t)(cache["k_exps"][layer],
                           jnp.swapaxes(k_e, -1, -2), positions)
    vc_l = jax.vmap(upd_t)(cache["v_codes"][layer],
                           jnp.swapaxes(v_c, -1, -2), positions)
    ve_l = jax.vmap(upd_t)(cache["v_exps"][layer],
                           jnp.swapaxes(v_e, -1, -2), positions)
    cache = {
        **cache,
        "k_codes": cache["k_codes"].at[layer].set(kc_l),
        "k_exps": cache["k_exps"].at[layer].set(ke_l),
        "v_codes": cache["v_codes"].at[layer].set(vc_l),
        "v_exps": cache["v_exps"].at[layer].set(ve_l),
    }
    k_l = dec(jnp.swapaxes(kc_l, -1, -2),
              jnp.swapaxes(ke_l, -1, -2), group, compute_dtype)
    v_l = dec(jnp.swapaxes(vc_l, -1, -2),
              jnp.swapaxes(ve_l, -1, -2), group, compute_dtype)
    return cache, k_l, v_l
