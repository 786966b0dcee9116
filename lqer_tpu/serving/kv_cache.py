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
