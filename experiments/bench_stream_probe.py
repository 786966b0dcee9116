#!/usr/bin/env python
"""Pure HBM->VMEM streaming probes for the packed-W4 serving tiles.

Round-2 finding (ROADMAP): the Pallas grid pipeline reaches only ~285 GB/s
on the (tile_k/2, tile_n) int8 packed tiles while XLA's dense bf16 dot
streams ~535 GB/s in the same window — the fetch, not the dequant VPU work,
caps the fused kernel. This probe isolates the fetch and sweeps the likely
levers:

  * buffer depth     — pl.Buffered(buffer_count=2..4) on the packed spec
  * element width    — the same bytes transferred as int8 vs int32 vs f32
                       (int8 HBM tiles are (32,128)x4-packed; 32-bit moves
                       may DMA more efficiently)
  * tile shape       — tile_k x tile_n fetch granularity

Methodology identical to bench.py: L layers scanned in ONE jit (single
dispatch per step), chained iterations, average-over-chain (bias-free
upward), min over repeats.
"""

import argparse
import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE = str(Path(__file__).resolve().parents[1] / ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _stream_kernel(x_ref, p_ref, o_ref, acc):
    """Full-tile touch with a REAL chain dependency.

    Two hard-won methodology rules are embedded here:
    * a narrow read (earlier revision read only 8x128 of each block) lets
      Mosaic narrow the DMA window itself — measured an impossible 10 TB/s;
      a whole-tile max forces every byte across the bus.
    * the kernel must CONSUME the chained x (acc starts from x_ref): if the
      streamed reduce is independent of x, the remote relay overlaps the
      "chained" dispatches across backend resources and the probe reads
      above speed-of-light (measured 12.4 TB/s round 3) — the round-2
      revision of this probe had that flaw, so its 285/535 GB/s numbers
      under-measured both sides.

    The VPU touch is an int32-bitcast max (int8 reductions are
    unimplemented in Mosaic; the 4x element cut also keeps the touch cost
    well below the DMA rates being measured)."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc[:] = x_ref[:]

    v = p_ref[:]
    if v.dtype == jnp.int8:
        v = pltpu.bitcast(v, jnp.int32)
    acc[:] = acc[:] + jnp.max(v).astype(jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:]


def make_stream_step(rows, cols, tile_r, tile_c, dtype, buffers,
                     lookahead=False, contiguous=False):
    grid = (cols // tile_c, rows // tile_r)  # r innermost: walk down K

    mode = None
    if buffers != 2:
        mode = pl.Buffered(buffer_count=buffers, use_lookahead=lookahead)

    if contiguous:
        # tile-major 4D layout: every (tile_r, tile_c) block is ONE
        # contiguous slab in HBM (the round-3 fetch fix hypothesis: the
        # 2D strided layout DMAs tile_r separate tile_c-byte rows)
        in_spec = pl.BlockSpec(
            (None, None, tile_r, tile_c), lambda c, r: (r, c, 0, 0),
            memory_space=pltpu.VMEM, pipeline_mode=mode)
    else:
        in_spec = pl.BlockSpec((tile_r, tile_c), lambda c, r: (r, c),
                               memory_space=pltpu.VMEM, pipeline_mode=mode)

    def one(x, p):
        return pl.pallas_call(
            _stream_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, 128), lambda c, r: (0, 0),
                             memory_space=pltpu.VMEM),
                in_spec,
            ],
            out_specs=pl.BlockSpec((8, 128), lambda c, r: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(x, p)

    @jax.jit
    def step(x, p_l):
        def body(x, p):
            # the kernel CONSUMES x (acc init) — serializes layer fetches.
            # `x + 1` keeps the chained value strictly non-convergent: a
            # converged x makes every outer dispatch bit-identical, and this
            # environment's relay memoizes identical dispatches (measured
            # 7 TB/s before this fix).
            y = one(x, p)
            return x + 1.0 + y * jnp.float32(1e-30), None

        x, _ = jax.lax.scan(body, x, p_l)
        return x

    return step


def chain_time(fn, x0, iters=64, warmup=2):
    """Drained with a VALUE fetch (`jax.device_get`): on this environment's
    remote relay `block_until_ready` returns before device execution
    completes (see bench.py _bench), under-measuring stream time."""
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.device_get(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.device_get(x)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--mbytes", type=int, default=22,
                    help="approx MB per layer to stream")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--cases", nargs="+", default=[
        "i8_512x1024_b2", "i32_128x1024_b2", "f32_128x1024_b2",
        "i8_1024x1024_b2", "i8_512x2048_b2", "i8_2048x1024_b2",
        "i8_256x1024_b2", "xla_reduce",
    ])
    args = ap.parse_args()
    L = args.layers

    # per-layer byte budget close to one 7B layer's packed stream
    # (qkv+o+mlp packed ~ 22MB at 4096 hidden)
    for case in args.cases:
        if case == "xla_reduce":
            # XLA baseline: scan-reduce the same int8 bytes (i8_512x1024
            # geometry) — calibrates the relay window's achievable read bw
            rows, cols, esize = 11264, 2048, 1
            total = rows * cols * esize * L
            p_l = jax.random.randint(jax.random.PRNGKey(0),
                                     (L, rows, cols), -100, 100,
                                     jnp.int32).astype(jnp.int8)
            x0 = jnp.zeros((8, 128), jnp.float32)

            @jax.jit
            def xstep(x, p_l):
                def body(x, p):
                    # fold x into the streamed bytes so each layer's read
                    # depends on the previous layer (same rule as the
                    # pallas kernel — see _stream_kernel docstring)
                    pi = p + x[0, 0].astype(p.dtype)
                    m = jnp.max(jax.lax.bitcast_convert_type(
                        pi.reshape(rows, cols // 4, 4), jnp.int32))
                    # non-convergent chain — see _stream_kernel docstring
                    return x + 1.0 + m.astype(jnp.float32) * 1e-30, None
                x, _ = jax.lax.scan(body, x, p_l)
                return x

            fn = lambda x: xstep(x, p_l)  # noqa: E731
            t = min(chain_time(fn, x0, iters=args.iters)
                    for _ in range(args.repeats))
            print(f"{case:>18}: {t*1e3:7.3f} ms/step  "
                  f"{total/t/1e9:6.1f} GB/s  ({total/1e6:.0f} MB/step)")
            continue
        try:
            dt_s, shape_s, buf_s = case.split("_")
            contiguous = dt_s.startswith("c")
            dt_key = "i" + dt_s[1:] if contiguous else dt_s
            tile_r, tile_c = (int(v) for v in shape_s.split("x"))
            dtype = {"i8": jnp.int8, "i32": jnp.int32,
                     "f32": jnp.float32}[dt_key]
            esize = jnp.dtype(dtype).itemsize
            lookahead = buf_s.endswith("la")
            buffers = int(buf_s.rstrip("la").lstrip("b"))

            bytes_per_layer = args.mbytes * 1024 * 1024
            elems = bytes_per_layer // esize
            rows = max(tile_r, (elems // tile_c // tile_r) * tile_r)
            cols = tile_c * 2  # two column tiles like the N sweep
            # halve rows but keep them a multiple of tile_r, so the grid
            # covers the array exactly and `total` counts streamed bytes
            rows = max(tile_r, (rows // 2 // tile_r) * tile_r)
            total = rows * cols * esize * L

            key = jax.random.PRNGKey(0)
            shape = ((L, rows // tile_r, cols // tile_c, tile_r, tile_c)
                     if contiguous else (L, rows, cols))
            if dtype == jnp.float32:
                p_l = jax.random.normal(key, shape, jnp.float32)
            else:
                p_l = jax.random.randint(key, shape, -100, 100,
                                         jnp.int32).astype(dtype)
            x0 = jnp.zeros((8, 128), jnp.float32)

            step = make_stream_step(rows, cols, tile_r, tile_c, dtype,
                                    buffers, lookahead, contiguous)
            fn = lambda x: step(x, p_l)  # noqa: E731
            t = min(chain_time(fn, x0, iters=args.iters)
                    for _ in range(args.repeats))
        except Exception as e:  # noqa: BLE001
            print(f"{case:>18}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        print(f"{case:>18}: {t*1e3:7.3f} ms/step  "
              f"{total/t/1e9:6.1f} GB/s  ({total/1e6:.0f} MB/step)")


if __name__ == "__main__":
    main()
