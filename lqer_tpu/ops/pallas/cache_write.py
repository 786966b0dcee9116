"""In-place KV-cache row writes (Pallas, ``input_output_aliases``).

`serving.decode._cache_write_full` originally wrote the new decode token's
K/V rows into the FULL layer-stacked cache with per-slot
`jax.lax.dynamic_update_slice` calls inside the layer scan. Measured on the
real chip (experiments/bench_attention_probe.py `write` case) that cost
~0.84 ms/layer — ~27 ms of a 32-layer decode step, a quarter of the whole
step: the DUS chain itself does not stay in place once the buffers also feed
a `pallas_call`, and the (L, d/16) exponent arrays additionally paid two
~33 MB layout-conversion copies per kernel call (XLA prefers swapped minor
dims for an 8-wide minor axis; Pallas requires the default layout).

This kernel replaces the chain with ONE `pallas_call` per layer that aliases
every cache array to its output (`input_output_aliases`) and touches only an
aligned window around each slot's write position: the buffer is updated in
place in HBM and the DMA traffic is a few hundred KB instead of buffer
copies. Mosaic requires trailing block dims of (8k, 128 | full dim) — int8
tiles are (32, 128) — so the kernel fetches the aligned window containing
``positions[b]`` (BlockSpec index map on the `positions` scalar-prefetch
ref), copies it to the aliased output block, and blends the new token in
with an iota mask (Mosaic cannot prove alignment for a dynamic sublane
store on int8 tiles).

Two array orientations are supported, inferred from the new-row shape:
  * token axis on dim 3 (codes, fp K/V: (NL, B, KVH, L, d), new row
    (B, KVH, 1, d)) — 32-row sublane window, sublane mask;
  * token axis on dim 4 (transposed exponents: (NL, B, KVH, d/g, L), new
    row (B, KVH, d/g, 1)) — 128-wide lane window, lane mask.

The math is unchanged: MXINT8 encoding of the new rows still happens outside
(`parallel.collectives.mx8_encode`, bit-exact vs the quantizers); only the
scatter moved into the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWBLK = 32    # int8 VMEM tile height — smallest legal sublane window
LANEBLK = 128  # lane tile width — smallest legal lane window


def _kernel(idx_ref, pos_ref, *refs, lane_axis: tuple):
    del idx_ref  # consumed by the BlockSpec index maps
    b = pl.program_id(0)
    n_arrays = len(lane_axis)
    cache_in = refs[:n_arrays]
    new = refs[n_arrays:2 * n_arrays]
    outs = refs[2 * n_arrays:]
    for c_ref, n_ref, o_ref, lane in zip(cache_in, new, outs, lane_axis):
        c = c_ref[...]
        n = jnp.broadcast_to(n_ref[...].astype(c.dtype), c.shape)
        dim, blk = (3, LANEBLK) if lane else (2, ROWBLK)
        r = pos_ref[b] % blk
        idx = jax.lax.broadcasted_iota(jnp.int32, c.shape, dim)
        o_ref[...] = jnp.where(idx == r, n, c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_kv_rows_stacked(
    cache_arrays: tuple,
    new_rows: tuple,
    layer_index: jnp.ndarray,
    positions: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> tuple:
    """Write one new token row per slot into layer-stacked cache arrays.

    ``cache_arrays``: tuple of (NL, B, KVH, *, *) arrays — codes/fp with the
    token axis on dim 3 (L % 32 == 0), or transposed exponents with the
    token axis on dim 4 (L % 128 == 0). ``new_rows``: matching rows with a
    1-sized token axis. ``layer_index``: scalar int32. ``positions``: (B,)
    int32 row per slot. Returns the updated arrays (same buffers, aliased in
    place on TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = len(cache_arrays)
    B = new_rows[0].shape[0]
    lane_axis = tuple(r.shape[3] == 1 and a.shape[4] > 1
                      for a, r in zip(cache_arrays, new_rows))
    for a, lane in zip(cache_arrays, lane_axis):
        L, blk = (a.shape[4], LANEBLK) if lane else (a.shape[3], ROWBLK)
        assert L % blk == 0, ("cache length not aligned", a.shape, blk)

    def im_cache(lane):
        if lane:
            return lambda b, idx, pos: (idx[0], b, 0, 0, pos[b] // LANEBLK)
        return lambda b, idx, pos: (idx[0], b, 0, pos[b] // ROWBLK, 0)

    def im_new(b, idx, pos):
        return (b, 0, 0, 0)

    specs_cache = [
        pl.BlockSpec(
            (None, 1, a.shape[2], a.shape[3], LANEBLK) if lane
            else (None, 1, a.shape[2], ROWBLK, a.shape[4]),
            im_cache(lane), memory_space=pltpu.VMEM)
        for a, lane in zip(cache_arrays, lane_axis)
    ]
    specs_new = [
        pl.BlockSpec((1, a.shape[1], a.shape[2], a.shape[3]), im_new,
                     memory_space=pltpu.VMEM)
        for a in new_rows
    ]
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in cache_arrays]
    # flat input order: [idx, pos, *cache, *new] — aliases count the scalar
    # prefetch operands, so cache input i is flat index 2 + i.
    aliases = {2 + i: i for i in range(n)}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=specs_cache + specs_new,
        out_specs=specs_cache,
    )
    return tuple(pl.pallas_call(
        functools.partial(_kernel, lane_axis=lane_axis),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        jnp.asarray(layer_index, jnp.int32).reshape(1),
        positions.astype(jnp.int32),
        *cache_arrays,
        *new_rows,
    ))
