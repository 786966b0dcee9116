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


def _kernel(idx_ref, pos_ref, *refs, lane_axis: tuple, batched: bool = False):
    del idx_ref  # consumed by the BlockSpec index maps
    b = pl.program_id(1 if batched else 0)
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

    PRECONDITION: positions[b] must be in [0, max_len). An out-of-range
    position makes the BlockSpec index map clamp to the LAST aligned
    window and the token silently lands in the wrong row — the engine
    guarantees in-bounds positions; external callers must too.
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


def write_kv_rows_all_layers(
    cache_arrays: tuple,
    new_rows: tuple,
    positions: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> tuple:
    """Batched variant of :func:`write_kv_rows_stacked`: write EVERY layer's
    new token row in ONE pallas_call (grid (NL, B)). ``new_rows``: arrays
    with a leading NL dim matching the cache's. One call per decode STEP
    instead of one per layer — per-call pipeline overheads measured ~10x the
    window-RMW byte cost when issued per layer inside the scan
    (bench_attention_probe `wkern`, round 4).

    Same positions-in-bounds precondition as write_kv_rows_stacked:
    positions[b] must be < max_len or the aligned window clamps and the
    token lands in the wrong window."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = len(cache_arrays)
    NL, B = new_rows[0].shape[0], new_rows[0].shape[1]
    lane_axis = tuple(r.shape[4] == 1 and a.shape[4] > 1
                      for a, r in zip(cache_arrays, new_rows))
    for a, lane in zip(cache_arrays, lane_axis):
        L, blk = (a.shape[4], LANEBLK) if lane else (a.shape[3], ROWBLK)
        assert L % blk == 0, ("cache length not aligned", a.shape, blk)

    def im_cache(lane):
        if lane:
            return lambda li, b, pos: (li, b, 0, 0, pos[b] // LANEBLK)
        return lambda li, b, pos: (li, b, 0, pos[b] // ROWBLK, 0)

    def im_new(li, b, pos):
        return (li, b, 0, 0, 0)

    specs_cache = [
        pl.BlockSpec(
            (None, 1, a.shape[2], a.shape[3], LANEBLK) if lane
            else (None, 1, a.shape[2], ROWBLK, a.shape[4]),
            im_cache(lane), memory_space=pltpu.VMEM)
        for a, lane in zip(cache_arrays, lane_axis)
    ]
    specs_new = [
        pl.BlockSpec((None, 1, r.shape[2], r.shape[3], r.shape[4]), im_new,
                     memory_space=pltpu.VMEM)
        for r in new_rows
    ]
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in cache_arrays]
    # flat input order: [pos, *cache, *new] — aliases count the scalar
    # prefetch operand, so cache input i is flat index 1 + i.
    aliases = {1 + i: i for i in range(n)}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NL, B),
        in_specs=specs_cache + specs_new,
        out_specs=specs_cache,
    )
    return tuple(pl.pallas_call(
        functools.partial(_kernel_all, lane_axis=lane_axis),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        positions.astype(jnp.int32),
        *cache_arrays,
        *new_rows,
    ))


def _kernel_all(pos_ref, *refs, lane_axis: tuple):
    return _kernel(None, pos_ref, *refs, lane_axis=lane_axis, batched=True)


# ---------------------------------------------------------------------------
# Fused MXINT8 encode + write (decode s=1, quantized cache)
# ---------------------------------------------------------------------------
from ...parallel.collectives import ceil_log2_exact as _ceil_log2_exact  # noqa: E402
# shared with the XLA-side `mx8_encode` so prefill-written and
# decode-written cache bytes agree by construction (ADVICE r4)


def _encode_t(vals_t, group, mb: float = 7.0, pack: bool = False):
    """`mx8_encode(..., zero_fill=1.0)` (or `mx4_encode` with ``mb=3,
    pack=True``) on TRANSPOSED values (d, N): groups of ``group`` along the
    sublane (d) axis. Returns (codes f32-held — (d, N), or (d/2, N)
    d-split nibble-packed when ``pack`` — and exps (d/group, N) f32-held):
    same bytes as the XLA encode once cast to int8."""
    dd, n = vals_t.shape
    v = vals_t.astype(jnp.float32).reshape(dd // group, group, n)
    bmax = jnp.max(jnp.abs(v), axis=1, keepdims=True)
    bmax = jnp.where(bmax == 0, jnp.float32(1.0), bmax)
    e = _ceil_log2_exact(bmax).astype(jnp.float32)
    sign = jnp.sign(v + 1e-9)
    shift = float(2 ** mb)
    mant = jnp.clip(
        jnp.round((jnp.abs(v) + 1e-9) / jnp.exp2(e) * shift), 0, shift - 1)
    codes = (sign * mant).reshape(dd, n)
    if pack:
        ci = codes.astype(jnp.int32)
        low = ci[:dd // 2] & 0xF
        high = ci[dd // 2:] & 0xF
        pu = (high << 4) | low
        codes = jnp.where(pu >= 128, pu - 256, pu).astype(jnp.float32)
    return codes, e.reshape(dd // group, n)


def _kernel_fused(idx_ref, pos_ref, kh_ref, vh_ref, kc_in, ke_in, vc_in,
                  ve_in, kc_o, ke_o, vc_o, ve_o, *, group):
    del idx_ref  # consumed by the BlockSpec index maps
    b = pl.program_id(0)
    r = pos_ref[b] % LANEBLK

    for h_ref, ins, outs in ((kh_ref, (kc_in, ke_in), (kc_o, ke_o)),
                             (vh_ref, (vc_in, ve_in), (vc_o, ve_o))):
        vals = h_ref[0, :, 0, :].astype(jnp.float32)     # (KVH, d)
        codes_t, exps_t = _encode_t(vals.T, group)       # (d, KVH), (d/g, KVH)
        for c_ref, o_ref, new_t in zip(ins, outs, (codes_t, exps_t)):
            c = c_ref[...]                                # (1, KVH, *, 128)
            n = jnp.broadcast_to(
                new_t.T[None, :, :, None].astype(c.dtype), c.shape)
            idx = jax.lax.broadcasted_iota(jnp.int32, c.shape, 3)
            o_ref[...] = jnp.where(idx == r, n, c)


def write_kv_tokens_fused(
    cache_arrays: tuple,   # (k_codes, k_exps, v_codes, v_exps) layer-stacked
    kh: jnp.ndarray,       # (B, KVH, 1, d) RAW new K rows (fp)
    vh: jnp.ndarray,
    layer_index: jnp.ndarray,
    positions: jnp.ndarray,
    *,
    group: int = 16,
    interpret: bool | None = None,
) -> tuple:
    """MXINT8-encode the new token's K/V rows IN-KERNEL and blend them into
    the aliased cache windows — replaces mx8_encode + swapaxes relayouts +
    `write_kv_rows_stacked` for the s=1 decode path (the XLA-side encode of
    a 32 KB tensor cost ~0.14 ms/layer in relayouts alone, round-4
    bench_step_split). Byte-identical to
    ``mx8_encode(zero_fill=1.0)`` + `write_kv_rows_stacked`
    (`tests/test_serving.py::test_fused_cache_write_matches_encode_write`).

    Positions-in-bounds precondition as everywhere in this module:
    positions[b] must be < max_len."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kc_a, ke_a, vc_a, ve_a = cache_arrays
    B, KVH = kh.shape[0], kh.shape[1]
    d = kh.shape[3]
    L = kc_a.shape[4]
    assert L % LANEBLK == 0 and kc_a.shape[3] == d, (kc_a.shape, kh.shape)
    assert d % group == 0

    def im_cache(li_dim):
        return lambda b, idx, pos: (idx[0], b, 0, 0, pos[b] // LANEBLK)

    spec_c = pl.BlockSpec((None, 1, KVH, d, LANEBLK), im_cache(0),
                          memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec((None, 1, KVH, d // group, LANEBLK), im_cache(0),
                          memory_space=pltpu.VMEM)
    spec_new = pl.BlockSpec((1, KVH, 1, d), lambda b, idx, pos: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    # flat inputs: [idx, pos, kh, vh, kc, ke, vc, ve] → cache arrays start
    # at flat index 4
    aliases = {4 + i: i for i in range(4)}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[spec_new, spec_new, spec_c, spec_e, spec_c, spec_e],
        out_specs=[spec_c, spec_e, spec_c, spec_e],
    )
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                  for a in cache_arrays]
    return tuple(pl.pallas_call(
        functools.partial(_kernel_fused, group=group),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        jnp.asarray(layer_index, jnp.int32).reshape(1),
        positions.astype(jnp.int32),
        kh.astype(jnp.float32),
        vh.astype(jnp.float32),
        *cache_arrays,
    ))


# ---------------------------------------------------------------------------
# Staged-cache flush: migrate completed ring blocks into the main cache
# ---------------------------------------------------------------------------
def _kernel_flush(fl_ref, nf_ref, *refs, n_arrays: int, sw: int, w: int):
    """Blend staged tokens [flushed, new_flushed) into ONE candidate
    128-lane main-cache window (pass ``w`` of 2). Window bases are
    128-aligned and SW divides 128, so ``token % SW == lane % SW`` — the
    ring maps onto the window by TILING (no lane gather). The mask is
    computed from the TRUE base ``(fl//128 + w) * 128``; when that window
    does not exist the BlockSpec clamps to the last window and the empty
    mask writes it back unchanged."""
    b = pl.program_id(1)
    fl = fl_ref[b]
    nf = nf_ref[b]
    mains = refs[:n_arrays]
    stages = refs[n_arrays:2 * n_arrays]
    outs = refs[2 * n_arrays:]
    base = (fl // LANEBLK + w) * LANEBLK
    reps = LANEBLK // sw
    for i in range(n_arrays):
        st = stages[i][...]              # (1, KVH, rows, SW)
        tiled = jnp.concatenate([st] * reps, axis=-1)  # (1, KVH, rows, 128)
        c = mains[i][...]
        lane = jax.lax.broadcasted_iota(jnp.int32, c.shape, 3)
        tok = base + lane
        valid = jnp.logical_and(tok >= fl, tok < nf)
        outs[i][...] = jnp.where(valid, tiled.astype(c.dtype), c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flush_stage_to_main(
    cache_arrays: tuple,   # 4x (NL, B, KVH, rows, L) main (codes/exps, K/V)
    stage_arrays: tuple,   # 4x (NL, B, KVH, rows, SW) staging rings
    flushed: jnp.ndarray,      # (B,) int32, 32-aligned
    new_flushed: jnp.ndarray,  # (B,) int32, 32-aligned, >= flushed
    *,
    interpret: bool | None = None,
) -> tuple:
    """Migrate every layer's staged tokens [flushed, new_flushed) from the
    SW-lane staging rings into the main cache: two aliased window-RMW
    launches (the span can straddle one 128-lane window boundary; a buffer
    cannot legally alias two outputs of one call). Runs once per 32 decode
    steps (the engine's flush clock), so the window RMW that cost
    ~35 MB/layer/step on the direct-write path amortizes to ~1/32 of that.
    Staging arrays are read-only (stale lanes below new_flushed are masked
    out by the staged attention kernel afterwards).

    PRECONDITION: new_flushed - flushed <= 63, both multiples of 32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = len(cache_arrays)
    NL, B = cache_arrays[0].shape[:2]
    L = cache_arrays[0].shape[-1]
    SW = stage_arrays[0].shape[-1]
    assert L % LANEBLK == 0 and LANEBLK % SW == 0, (L, SW)
    n_w = L // LANEBLK

    def im_main(w):
        def f(li, b, fl, nf):
            return (li, b, 0, 0,
                    jnp.minimum(fl[b] // LANEBLK + w, n_w - 1))
        return f

    def im_stage(li, b, fl, nf):
        return (li, b, 0, 0, 0)

    specs_stage = [
        pl.BlockSpec((None, 1, s.shape[2], s.shape[3], SW), im_stage,
                     memory_space=pltpu.VMEM)
        for s in stage_arrays
    ]
    out = tuple(cache_arrays)
    for w in range(2):
        specs_main = [
            pl.BlockSpec((None, 1, a.shape[2], a.shape[3], LANEBLK),
                         im_main(w), memory_space=pltpu.VMEM)
            for a in cache_arrays
        ]
        out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                      for a in cache_arrays]
        # flat inputs: fl(0) nf(1) mains(2..2+n) stages; alias main i -> out i
        aliases = {2 + i: i for i in range(n)}
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NL, B),
            in_specs=specs_main + specs_stage,
            out_specs=specs_main,
        )
        out = pl.pallas_call(
            functools.partial(_kernel_flush, n_arrays=n, sw=SW, w=w),
            grid_spec=grid_spec,
            out_shape=out_shapes,
            input_output_aliases=aliases,
            interpret=interpret,
        )(
            flushed.astype(jnp.int32), new_flushed.astype(jnp.int32),
            *out, *stage_arrays,
        )
    return tuple(out)
