"""Packed low-precision storage codecs for real (non-emulated) serving.

The reference only fake-quantizes (quantize→dequantize in fp, then dense
GEMM — SURVEY.md §0); for a real TPU serving path we store MXINT tensors as

* ``codes`` — signed integer mantissas ``sign·mant_int`` with
  ``mant_int = clamp(round(|x|/2^e · 2^mb), 0, 2^mb−1)``; int4 codes are
  packed two-per-int8 **tile-locally split along K** (rows ``k`` and
  ``k+TK/2`` of each K-tile share a byte) so the in-kernel unpack is a
  nibble-shift + concat along sublanes — no interleave relayout.
* ``exponents`` — one int8 shared exponent per (group of 16 along K, col).

Dequantized values are **exactly representable in bfloat16** for widths ≤ 9
(mantissa integers < 2^8), so the MXU bf16 path reproduces the reference's
fp32 fake-quant GEMM math up to f32 accumulation order.

Mirrors `block_fp` semantics (`/root/reference/src/lqer/quantize/quantizers/
block_fp.py:39-68`) including ceil-log2 shared exponent, exponent clamping,
zero-block handling and mantissa saturation.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MXFormat:
    width: int = 4  # sign + (width-1) mantissa bits
    exponent_width: int = 8
    group_size: int = 16

    @property
    def mantissa_bits(self) -> int:
        return self.width - 1

    @property
    def exponent_bias(self) -> int:
        return 2 ** (self.exponent_width - 1) - 1


MXINT4 = MXFormat(width=4)
MXINT8 = MXFormat(width=8)


def quantize_mx(
    w: jnp.ndarray, fmt: MXFormat = MXINT4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize ``w (K, N)`` with groups of ``fmt.group_size`` along K.

    Returns ``(codes int8 (K, N), exponents int8 (K/g, N))`` such that
    ``dequant = codes · 2^(exponents − mantissa_bits)`` equals the reference
    ``block_fp_quantizer(w.T, block_size=[1, g], skip_first_dim=False).T``
    for non-(near-)zero inputs. (The reference's |x|≤1e-8 passthrough keeps
    exact zeros exact; integer codes make them exactly zero anyway.)
    """
    K, N = w.shape
    g = fmt.group_size
    assert K % g == 0, (K, g)
    wf = w.astype(jnp.float32)
    v = wf.reshape(K // g, g, N)
    bmax = jnp.max(jnp.abs(v), axis=1, keepdims=True)

    nz_min = jnp.min(jnp.where(bmax != 0, bmax, jnp.inf))
    fill = jnp.where(jnp.isinf(nz_min), jnp.float32(1.0), nz_min)
    bmax = jnp.where(bmax == 0, fill, bmax)

    bias = fmt.exponent_bias
    e = jnp.clip(
        jnp.ceil(jnp.log2(bmax)), -bias, 2**fmt.exponent_width - 1 - bias
    )
    mb = fmt.mantissa_bits
    shift = float(2**mb)
    sign = jnp.sign(v + 1e-9)
    mant = jnp.clip(
        jnp.round((jnp.abs(v) + 1e-9) / jnp.exp2(e) * shift), 0, 2**mb - 1
    )
    codes = (sign * mant).astype(jnp.int8).reshape(K, N)
    exponents = e.astype(jnp.int8).reshape(K // g, N)
    return codes, exponents


def dequantize_mx(
    codes: jnp.ndarray,
    exponents: jnp.ndarray,
    fmt: MXFormat = MXINT4,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """codes (K,N) int8, exponents (K/g,N) int8 → values (K,N)."""
    K, N = codes.shape
    g = fmt.group_size
    scale = jnp.exp2(
        exponents.astype(jnp.float32) - fmt.mantissa_bits
    )  # (K/g, N)
    v = codes.astype(jnp.float32).reshape(K // g, g, N) * scale[:, None, :]
    return v.reshape(K, N).astype(dtype)


# ---------------------------------------------------------------------------
# int4 packing (two codes per int8, tile-local K-split layout)
# ---------------------------------------------------------------------------
def pack_int4_ksplit(codes: jnp.ndarray, tile_k: int = 256) -> jnp.ndarray:
    """(K, N) int8 codes in [-8, 7] → (K/2, N) int8 packed.

    Within each K-tile of ``tile_k`` rows, row ``j`` of the packed tile holds
    code ``j`` in the low nibble and code ``j + tile_k/2`` in the high
    nibble. Unpack = nibble shifts + concat along sublanes (no interleave).
    """
    K, N = codes.shape
    assert K % tile_k == 0 and tile_k % 2 == 0, (K, tile_k)
    half = tile_k // 2
    t = codes.reshape(K // tile_k, 2, half, N)  # [tile, half-idx, j, n]
    low = t[:, 0].astype(jnp.int32) & 0xF
    high = t[:, 1].astype(jnp.int32) & 0xF
    packed = (high << 4) | low
    # int8 overflow-safe: values 0..255 -> int8 via uint8 view
    return packed.astype(jnp.uint8).view(jnp.int8).reshape(K // 2, N)


def pack_w4_tiles(
    codes: jnp.ndarray,
    exps: jnp.ndarray,
    tile_k: int,
    tile_n: int,
    group: int = 16,
) -> jnp.ndarray:
    """Tile-major co-packed serving layout (the round-3 fetch fix).

    ``codes (K, N)`` int4-valued int8 + ``exps (K/group, N)`` int8 →
    ``tiles (K/tile_k, N/tile_n, S, tile_n)`` int8 where each (k, n) slab is
    ONE contiguous HBM region holding the K-split nibble-packed codes
    (``tile_k/2`` rows) followed by the shared exponents (``tile_k/group``
    rows), padded to a multiple of 32 rows (the int8 sublane tile).

    Why: the previous 2D ``(K/2, N)`` layout made every kernel tile fetch
    ``tile_k/2`` separate ``tile_n``-byte strided rows plus a second tiny
    strided stream for the exponents; tile-major storage turns each grid
    step's weight traffic into a single ~0.5 MB contiguous DMA.
    """
    K, N = codes.shape
    assert K % tile_k == 0 and N % tile_n == 0, (K, N, tile_k, tile_n)
    nk, nn = K // tile_k, N // tile_n
    half = tile_k // 2
    ge = tile_k // group
    packed = pack_int4_ksplit(codes, tile_k)  # (K/2, N), tile-local K-split
    p_t = packed.reshape(nk, half, nn, tile_n).transpose(0, 2, 1, 3)
    e_t = exps.reshape(nk, ge, nn, tile_n).transpose(0, 2, 1, 3)
    s = half + ge
    s_pad = -s % 32
    tiles = jnp.concatenate([p_t, e_t], axis=2)
    if s_pad:
        tiles = jnp.pad(tiles, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
    return tiles


def pack_w8_tiles(
    codes: jnp.ndarray,
    exps: jnp.ndarray,
    tile_k: int,
    tile_n: int,
    group: int = 16,
) -> jnp.ndarray:
    """Tile-major co-packed layout for DIRECT int8 codes (width > 4 — no
    nibble packing): each (k, n) slab holds ``tile_k`` code rows followed by
    ``tile_k/group`` exponent rows, padded to the 32-row int8 sublane tile.
    Same contiguous-DMA rationale as :func:`pack_w4_tiles`; the kernel's
    ``_dot_w4`` dispatches on the format's mantissa width."""
    K, N = codes.shape
    assert K % tile_k == 0 and N % tile_n == 0, (K, N, tile_k, tile_n)
    nk, nn = K // tile_k, N // tile_n
    ge = tile_k // group
    c_t = codes.reshape(nk, tile_k, nn, tile_n).transpose(0, 2, 1, 3)
    e_t = exps.reshape(nk, ge, nn, tile_n).transpose(0, 2, 1, 3)
    s = tile_k + ge
    s_pad = -s % 32
    tiles = jnp.concatenate([c_t, e_t], axis=2)
    if s_pad:
        tiles = jnp.pad(tiles, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
    return tiles


def unpack_int4_ksplit(packed: jnp.ndarray, tile_k: int = 256) -> jnp.ndarray:
    """Inverse of :func:`pack_int4_ksplit` (reference implementation for
    tests; the Pallas kernel does this per-tile in VMEM)."""
    K2, N = packed.shape
    K = K2 * 2
    half = tile_k // 2
    p = packed.view(jnp.uint8).astype(jnp.int32).reshape(K // tile_k, half, N)
    low = (p << 28) >> 28  # sign-extended low nibble
    high = (p << 24) >> 28  # sign-extended high nibble
    t = jnp.stack([low, high], axis=1)  # [tile, half-idx, j, n]
    return t.astype(jnp.int8).reshape(K, N)
