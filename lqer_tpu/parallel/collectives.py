"""Quantized collectives: compress activations to MXINT8 before crossing ICI.

EQuARX-style (see PAPERS.md) capability the reference cannot express (it has
no communication backend at all, SURVEY.md §2.9): a tensor-parallel
all-gather moves shared-exponent int8 codes + per-16-group int8 exponents —
~2.1x less interconnect traffic than bf16 — and decodes on arrival. Values
are exactly the MXINT8 grid (the same activation format the quantized
matmuls consume), so feeding a gathered activation into a quantized linear
loses nothing: the x_quantizer would have produced the same grid anyway.

Built on `shard_map` + `lax.all_gather`; XLA routes the int8 payload over
ICI. A Pallas RDMA ring variant is a natural follow-up once multi-chip
hardware is available to validate against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ceil_log2_exact(x: jnp.ndarray) -> jnp.ndarray:
    """clip(ceil(log2(x)), -127, 128) for positive finite f32 ``x`` via
    exponent-field bit arithmetic — EXACT on every input. The float
    ``ceil(log2(x))`` path can round DOWN onto the integer for absmax
    values marginally above a power of two (log2(2^k·(1+ulp)) rounds to k
    for k >= 2), picking exponent k with a saturated code 127 where the
    exact result is k+1 with code 64; sharing this helper between the XLA
    encode and the Pallas cache-write kernel (`cache_write._encode_t`)
    makes prefill-written and decode-written cache bytes identical by
    construction (ADVICE r4)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    be = (bits >> 23) & 0xFF
    m = bits & 0x7FFFFF
    e = jnp.where(be == 0, -127, be - 127 + (m != 0).astype(jnp.int32))
    return jnp.clip(e, -127, 128)


def mx8_encode(x: jnp.ndarray, group: int = 16, zero_fill: float | None = None):
    """(…, F) float → (codes int8, exps int8) with groups along the last dim.

    Same numerics as `block_fp_quantizer(width=8, block_size=[1, group],
    skip_first_dim=True)` for F divisible by `group` — except on absmax
    values a float-ulp above a power of two, where this path's exact
    bit-arithmetic exponent (`ceil_log2_exact`) picks k+1/code-64 while the
    quantizer's float log2 can round down to k/saturated-127 (the exact
    result is also the more accurate one; the quantizer keeps the float
    path for bit-parity with the reference torch oracle).

    ``zero_fill``: absmax stand-in for all-zero groups (their codes are 0
    and decode to 0 either way — only the stored exponent byte depends on
    it). None reproduces `block_fp_quantizer`'s data-dependent
    min-nonzero-absmax fill (collectives parity); the KV-cache writers pass
    1.0 so the fused Pallas cache-write kernel — which sees one slot at a
    time and cannot compute a global min — produces byte-identical caches.
    """
    *lead, f = x.shape
    assert f % group == 0, (f, group)
    xf = x.astype(jnp.float32).reshape(*lead, f // group, group)
    bmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    if zero_fill is None:
        nz_min = jnp.min(jnp.where(bmax != 0, bmax, jnp.inf))
        fill = jnp.where(jnp.isinf(nz_min), jnp.float32(1.0), nz_min)
    else:
        fill = jnp.float32(zero_fill)
    bmax = jnp.where(bmax == 0, fill, bmax)
    e = ceil_log2_exact(bmax).astype(jnp.float32)
    sign = jnp.sign(xf + 1e-9)
    mant = jnp.clip(
        jnp.round((jnp.abs(xf) + 1e-9) / jnp.exp2(e) * 128.0), 0, 127
    )
    codes = (sign * mant).astype(jnp.int8).reshape(*lead, f)
    exps = e.astype(jnp.int8).reshape(*lead, f // group)
    return codes, exps


def mx4_encode(x: jnp.ndarray, group: int = 16,
               zero_fill: float | None = None):
    """(…, F) float → (codes int8 (…, F/2) nibble-packed, exps int8
    (…, F/group)) — the MXINT4 KV-cache codec (round 5, opt-in KV4).

    Same shared-exponent math as :func:`mx8_encode` at width 4 (3 mantissa
    bits). Packing convention (matches the Pallas kernels' sublane-concat
    unpack): packed element ``i`` holds value ``i`` in the low nibble and
    value ``i + F/2`` in the high nibble — the F-split layout, so unpack is
    two shifts + a concat, no interleave."""
    *lead, f = x.shape
    assert f % (2 * group) == 0, (f, group)
    xf = x.astype(jnp.float32).reshape(*lead, f // group, group)
    bmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    if zero_fill is None:
        nz_min = jnp.min(jnp.where(bmax != 0, bmax, jnp.inf))
        fill = jnp.where(jnp.isinf(nz_min), jnp.float32(1.0), nz_min)
    else:
        fill = jnp.float32(zero_fill)
    bmax = jnp.where(bmax == 0, fill, bmax)
    e = ceil_log2_exact(bmax).astype(jnp.float32)
    sign = jnp.sign(xf + 1e-9)
    mant = jnp.clip(
        jnp.round((jnp.abs(xf) + 1e-9) / jnp.exp2(e) * 8.0), 0, 7
    )
    codes = (sign * mant).astype(jnp.int32).reshape(*lead, f)
    half = f // 2
    low = codes[..., :half] & 0xF
    high = codes[..., half:] & 0xF
    packed_u = (high << 4) | low
    packed = jnp.where(packed_u >= 128, packed_u - 256, packed_u)
    exps = e.astype(jnp.int8).reshape(*lead, f // group)
    return packed.astype(jnp.int8), exps


def mx4_decode(codes: jnp.ndarray, exps: jnp.ndarray, group: int = 16,
               dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of :func:`mx4_encode`: (…, F/2) packed + (…, F/group) exps →
    (…, F) values (scale = 2^(e − 3))."""
    *lead, half = codes.shape
    f = half * 2
    c = codes.astype(jnp.int32)
    low = (c << 28) >> 28
    high = (c << 24) >> 28
    vals = jnp.concatenate([low, high], axis=-1).astype(jnp.float32)
    scale = jnp.exp2(exps.astype(jnp.float32) - 3.0)
    v = vals.reshape(*lead, f // group, group) * scale[..., None]
    return v.reshape(*lead, f).astype(dtype)


def mx8_decode(codes: jnp.ndarray, exps: jnp.ndarray, group: int = 16,
               dtype=jnp.float32) -> jnp.ndarray:
    *lead, f = codes.shape
    scale = jnp.exp2(exps.astype(jnp.float32) - 7.0)
    v = codes.astype(jnp.float32).reshape(*lead, f // group, group)
    v = v * scale[..., None]
    return v.reshape(*lead, f).astype(dtype)


def quantized_all_gather(
    x: jnp.ndarray,
    axis_name: str,
    *,
    gather_axis: int = 0,
    group: int = 16,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """all_gather(x) with MXINT8 compression over the wire.

    Call inside `shard_map`; equivalent (bit-for-bit) to
    ``lax.all_gather(mx8_roundtrip(x), axis_name)`` — the quantization error
    is exactly one activation-format quantization, which downstream quantized
    ops apply anyway.
    """
    codes, exps = mx8_encode(x, group)
    codes_g = jax.lax.all_gather(codes, axis_name, axis=gather_axis, tiled=True)
    exps_g = jax.lax.all_gather(exps, axis_name, axis=gather_axis, tiled=True)
    return mx8_decode(codes_g, exps_g, group, dtype)


def quantized_psum_scatter(
    x: jnp.ndarray,
    axis_name: str,
    *,
    scatter_axis: int = 0,
    group: int = 16,
) -> jnp.ndarray:
    """Reduce-scatter where each hop's payload is MXINT8-compressed.

    Ring reduce-scatter via ppermute: at each of the N-1 steps a shard-sized
    chunk is quantized, sent one hop, decoded and accumulated. The f32
    accumulation happens at full precision; only the wire format is 8-bit
    (per-hop requantization adds one quantization per hop, the EQuARX
    trade-off).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    chunks = jnp.split(x, n, axis=scatter_axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    # device-dependent chunk selection must be dynamic: stack + take
    stacked = jnp.stack(chunks)  # (n, ..., F/n)

    def take(i):
        return jnp.take(stacked, jnp.mod(i, n), axis=0)

    # ring schedule: device i starts with its local chunk (i-1); at step s it
    # receives the partial for chunk (i-1-s) and adds its local copy; after
    # n-1 steps it owns the fully reduced chunk i.
    acc = take(idx - 1)
    for step in range(1, n):
        codes, exps = mx8_encode(acc, group)
        codes = jax.lax.ppermute(codes, axis_name, perm)
        exps = jax.lax.ppermute(exps, axis_name, perm)
        received = mx8_decode(codes, exps, group)
        acc = received + take(idx - 1 - step)
    return acc
