"""Dequantize-to-fp loaders for HF-ecosystem quantized checkpoints.

The reference's baseline table evaluates AWQ / GPTQ / LLM.int8() / int4
checkpoints through their CUDA kernels
(`/root/reference/experiments/baselines/baseline.py:93-109`,
`baseline_auto_gptq.py`). Those kernels have no TPU runtime, but the
comparison rows only need the NUMBERS the formats represent: this module
decodes the packed checkpoint tensors to full-precision weights, which then
run through our standard fp forward (weights-only quantization means the
dequantized model IS the model those kernels compute, up to their matmul
precision).

Implemented conventions (the de-facto single-version formats):

* **GPTQ** (AutoGPTQ / gptqmodel, 4-bit, row-packed):
  ``qweight (in/8, out) int32`` — eight 4-bit codes per int32 along
  in_features, little-end nibble first; ``qzeros (groups, out/8) int32``
  packed the same way; ``scales (groups, out) f16``; optional
  ``g_idx (in,) int32`` (group of each in-channel; defaults to
  ``k // group_size``). ``W[n, k] = scales[g,n] * (code[k,n] - zero[g,n])``
  with AutoGPTQ's historical ``+1`` zero offset applied when
  ``zero_offset=True`` (checkpoints store ``z-1``; gptqmodel v2 sets
  ``sym=True`` checkpoints without the offset).
* **AWQ** (AutoAWQ "GEMM" kernels, 4-bit):
  ``qweight (in, out/8) int32`` — eight 4-bit codes per int32 along
  out_features in the interleaved order ``[0, 2, 4, 6, 1, 3, 5, 7]``;
  ``qzeros (in/group, out/8) int32`` same packing; ``scales (in/group,
  out) f16``. ``W[n, k] = scales[g,n] * (code[k,n] - zero[g,n])``.

All outputs are ``(out_features, in_features) float32`` — our models' weight
layout.
"""

from __future__ import annotations

import numpy as np

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _unpack_int32_nibbles(packed: np.ndarray, axis: int) -> np.ndarray:
    """int32 array → eight 4-bit codes per element expanded along ``axis``
    (little-end nibble first)."""
    p = packed.astype(np.uint32)
    shifts = np.arange(8, dtype=np.uint32) * 4
    shape = [1] * (p.ndim + 1)
    shape[axis + 1 if axis >= 0 else axis] = 8
    # expand a new axis right after `axis`, then merge
    p = np.expand_dims(p, axis + 1 if axis >= 0 else p.ndim)
    codes = (p >> shifts.reshape(shape)) & 0xF
    # merge the nibble axis into `axis`
    codes = np.moveaxis(codes, axis + 1 if axis >= 0 else -1, axis + 1)
    new_shape = list(packed.shape)
    new_shape[axis] *= 8
    return codes.reshape(new_shape).astype(np.int32)


def dequantize_gptq_weight(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: np.ndarray | None = None,
    bits: int = 4,
    zero_offset: bool = True,
) -> np.ndarray:
    """AutoGPTQ 4-bit tensors → (out, in) float32."""
    if bits != 4:
        raise NotImplementedError("only 4-bit GPTQ checkpoints supported")
    codes = _unpack_int32_nibbles(np.asarray(qweight), axis=0)  # (in, out)
    zeros = _unpack_int32_nibbles(np.asarray(qzeros), axis=1)  # (groups, out)
    if zero_offset:
        zeros = zeros + 1
    scales = np.asarray(scales, dtype=np.float32)  # (groups, out)
    in_features = codes.shape[0]
    if g_idx is None:
        group_size = in_features // scales.shape[0]
        g_idx = np.arange(in_features) // group_size
    g_idx = np.asarray(g_idx, dtype=np.int64)
    w = scales[g_idx, :] * (codes.astype(np.float32) - zeros[g_idx, :])
    return np.ascontiguousarray(w.T.astype(np.float32))  # (out, in)


def dequantize_awq_weight(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    bits: int = 4,
) -> np.ndarray:
    """AutoAWQ GEMM 4-bit tensors → (out, in) float32."""
    if bits != 4:
        raise NotImplementedError("only 4-bit AWQ checkpoints supported")

    def unpack_awq(p):
        codes = _unpack_int32_nibbles(np.asarray(p), axis=1)
        # undo the kernel interleave: stored order per int32 is AWQ_ORDER
        c = codes.reshape(codes.shape[0], -1, 8)
        undone = np.empty_like(c)
        undone[:, :, AWQ_ORDER] = c
        return undone.reshape(codes.shape)

    codes = unpack_awq(qweight)  # (in, out)
    zeros = unpack_awq(qzeros)  # (groups, out)
    scales = np.asarray(scales, dtype=np.float32)  # (groups, out)
    group_size = codes.shape[0] // scales.shape[0]
    g_idx = np.arange(codes.shape[0]) // group_size
    w = scales[g_idx, :] * (codes.astype(np.float32) - zeros[g_idx, :])
    return np.ascontiguousarray(w.T.astype(np.float32))


def dequantize_checkpoint(
    tensors: dict[str, np.ndarray],
    fmt: str,
    zero_offset: bool = True,
) -> dict[str, np.ndarray]:
    """Flat checkpoint dict with ``<module>.qweight/qzeros/scales[/g_idx]``
    groups → flat fp dict with ``<module>.weight`` (plus every non-packed
    tensor passed through). ``fmt``: "gptq" | "awq"."""
    if fmt not in ("gptq", "awq"):
        raise ValueError(f"unknown quantized checkpoint format {fmt!r}")
    out: dict[str, np.ndarray] = {}
    packed_suffixes = (".qweight", ".qzeros", ".scales", ".g_idx")
    modules = sorted({
        k[: -len(".qweight")] for k in tensors if k.endswith(".qweight")
    })
    for mod in modules:
        qweight = tensors[mod + ".qweight"]
        qzeros = tensors[mod + ".qzeros"]
        scales = tensors[mod + ".scales"]
        if fmt == "gptq":
            w = dequantize_gptq_weight(
                qweight, qzeros, scales, tensors.get(mod + ".g_idx"),
                zero_offset=zero_offset,
            )
        else:
            w = dequantize_awq_weight(qweight, qzeros, scales)
        out[mod + ".weight"] = w
    for k, v in tensors.items():
        if not any(k.endswith(s) for s in packed_suffixes):
            out[k] = np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# synthetic packers (tests + tooling; the inverse of the dequantizers)
# ---------------------------------------------------------------------------
def _pack_int32_nibbles(codes: np.ndarray, axis: int) -> np.ndarray:
    c = np.asarray(codes, dtype=np.uint32) & 0xF
    new_shape = list(c.shape)
    new_shape[axis] //= 8
    c = np.moveaxis(c, axis, -1).reshape(*np.moveaxis(c, axis, -1).shape[:-1],
                                         new_shape[axis], 8)
    shifts = (np.arange(8, dtype=np.uint32) * 4)
    packed = (c << shifts).astype(np.uint64).sum(axis=-1).astype(np.uint32)
    return np.moveaxis(packed, -1, axis).astype(np.int32)


def pack_gptq_weight(w: np.ndarray, group_size: int = 128,
                     zero_offset: bool = True):
    """Quantize (out, in) fp → AutoGPTQ-format tensors (asymmetric min-max
    per group). Returns (qweight, qzeros, scales, g_idx)."""
    out_f, in_f = w.shape
    wt = np.asarray(w, np.float32).T  # (in, out)
    groups = in_f // group_size
    g_idx = np.arange(in_f) // group_size
    codes = np.empty((in_f, out_f), np.int32)
    zeros = np.empty((groups, out_f), np.int32)
    scales = np.empty((groups, out_f), np.float32)
    for g in range(groups):
        blk = wt[g * group_size:(g + 1) * group_size]
        lo, hi = blk.min(0), blk.max(0)
        scale = np.maximum((hi - lo) / 15.0, 1e-8)
        zero = np.clip(np.round(-lo / scale), 0, 15)
        q = np.clip(np.round(blk / scale + zero), 0, 15)
        codes[g * group_size:(g + 1) * group_size] = q
        zeros[g] = zero
        scales[g] = scale
    qweight = _pack_int32_nibbles(codes, axis=0)
    qzeros = _pack_int32_nibbles(zeros - (1 if zero_offset else 0), axis=1)
    return qweight, qzeros, scales.astype(np.float16), g_idx.astype(np.int32)


def pack_awq_weight(w: np.ndarray, group_size: int = 128):
    """Quantize (out, in) fp → AutoAWQ GEMM-format tensors."""
    out_f, in_f = w.shape
    wt = np.asarray(w, np.float32).T  # (in, out)
    groups = in_f // group_size
    codes = np.empty((in_f, out_f), np.int32)
    zeros = np.empty((groups, out_f), np.int32)
    scales = np.empty((groups, out_f), np.float32)
    for g in range(groups):
        blk = wt[g * group_size:(g + 1) * group_size]
        lo, hi = blk.min(0), blk.max(0)
        scale = np.maximum((hi - lo) / 15.0, 1e-8)
        zero = np.clip(np.round(-lo / scale), 0, 15)
        codes[g * group_size:(g + 1) * group_size] = np.clip(
            np.round(blk / scale + zero), 0, 15)
        zeros[g] = zero
        scales[g] = scale

    def pack_awq(c):
        r = c.reshape(c.shape[0], -1, 8)[:, :, AWQ_ORDER]
        return _pack_int32_nibbles(r.reshape(c.shape), axis=1)

    return pack_awq(codes), pack_awq(zeros), scales.astype(np.float16)
