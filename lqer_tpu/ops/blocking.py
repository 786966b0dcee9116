"""Block partitioning for shared-exponent / grouped quantization.

TPU-native re-implementation of the blocking semantics used by the reference
(`/root/reference/src/lqer/quantize/quantizers/utils.py:42-321`). The reference
extracts blocks with ``F.unfold``/``F.fold``; here we pad and take an
interleaved ``(n0, b0, n1, b1, ...)`` reshape view, reduce over the block axes
with ``keepdims`` and let broadcasting carry the per-block statistic back to
every element. For per-block absmax + elementwise requantization the two are
mathematically identical, and the reshape form compiles to a few fused vector
ops on TPU (no gather/scatter, fully static shapes).

Semantics preserved from the reference:

* ``infer_block_shape`` right-aligns ``block_shape`` with ``x.shape``; missing
  leading dims become ``-1``; ``-1`` or oversized entries clamp to the dim size
  (`utils.py:42-67`).
* ``skip_first_dim=True`` treats the leading (batch) dim as never blocked: the
  block shape is inferred against ``[1, *x.shape[1:]]`` so the first block dim
  is always 1 (`utils.py:127-144,211-237`).
* Padding (zeros) extends each dim to a multiple of the block dim
  (`utils.py:70-83`).
"""

from __future__ import annotations

import jax.numpy as jnp


def infer_block_shape(
    x_shape: tuple[int, ...],
    block_shape: list[int] | tuple[int, ...] | int,
    skip_first_dim: bool = False,
) -> list[int]:
    """Resolve a user block shape against an array shape.

    Mirrors `_infer_block_shape` (reference `utils.py:42-67`) plus the
    ``skip_first_dim`` convention of the activation blockers.
    """
    x_shape = list(x_shape)
    if isinstance(block_shape, int):
        block_shape = [block_shape]
    block_shape = list(block_shape)

    shape_for_infer = list(x_shape)
    if skip_first_dim:
        shape_for_infer[0] = 1

    ndim = len(shape_for_infer)
    if len(block_shape) >= ndim:
        eff = block_shape[-ndim:]
    else:
        eff = [-1] * (ndim - len(block_shape)) + block_shape

    out = []
    for b, d in zip(eff, shape_for_infer):
        if b == -1 or b > d:
            out.append(d)
        else:
            out.append(b)
    return out


def padded_shape(x_shape: tuple[int, ...], eff_block: list[int]) -> list[int]:
    """Shape after padding each dim up to a multiple of its block dim."""
    return [-(-d // b) * b for d, b in zip(x_shape, eff_block)]


def pad_to_blocks(x: jnp.ndarray, eff_block: list[int]) -> jnp.ndarray:
    """Zero-pad ``x`` so every dim is a multiple of its block dim."""
    target = padded_shape(x.shape, eff_block)
    pads = [(0, t - d) for d, t in zip(x.shape, target)]
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads)


def blocked_view(x: jnp.ndarray, eff_block: list[int]) -> jnp.ndarray:
    """Reshape padded ``x`` to ``(n0, b0, n1, b1, ...)``."""
    new_shape: list[int] = []
    for d, b in zip(x.shape, eff_block):
        new_shape += [d // b, b]
    return x.reshape(new_shape)


def block_axes(ndim: int) -> tuple[int, ...]:
    """Axes of the block dims in a `blocked_view` array (odd positions)."""
    return tuple(2 * i + 1 for i in range(ndim))


def per_block_absmax(
    x: jnp.ndarray,
    block_shape: list[int] | int,
    skip_first_dim: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, list[int]]:
    """Return ``(blocked_x, per_block_absmax, eff_block)``.

    ``blocked_x`` is the padded interleaved view; ``per_block_absmax`` has
    keepdims and broadcasts against it. Matches the per-block max computed by
    the reference blockers (`utils.py:102,142,181,235`).
    """
    eff = infer_block_shape(x.shape, block_shape, skip_first_dim)
    padded = pad_to_blocks(x, eff)
    v = blocked_view(padded, eff)
    bmax = jnp.max(jnp.abs(v), axis=block_axes(x.ndim), keepdims=True)
    return v, bmax, eff


def unblock(
    blocked: jnp.ndarray,
    x_shape: tuple[int, ...],
    eff_block: list[int],
) -> jnp.ndarray:
    """Collapse an interleaved blocked view back and strip the padding."""
    padded = blocked.reshape(padded_shape(x_shape, eff_block))
    slices = tuple(slice(0, d) for d in x_shape)
    return padded[slices]
