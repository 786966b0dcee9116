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


def _stream_kernel(p_ref, o_ref, acc):
    """Full-tile touch: a narrow read (earlier revision read only 8x128 of
    each block) lets Mosaic narrow the DMA window itself — measured an
    impossible 10 TB/s. A whole-tile max forces every byte across the bus;
    the VPU reduce costs ~1 op/element, negligible vs DMA at these rates."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[0, 0] += jnp.max(p_ref[:]).astype(jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:]


def make_stream_step(rows, cols, tile_r, tile_c, dtype, buffers,
                     lookahead=False):
    grid = (cols // tile_c, rows // tile_r)  # r innermost: walk down K

    mode = None
    if buffers != 2:
        mode = pl.Buffered(buffer_count=buffers, use_lookahead=lookahead)

    def one(p):
        return pl.pallas_call(
            _stream_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_r, tile_c), lambda c, r: (r, c),
                             memory_space=pltpu.VMEM, pipeline_mode=mode),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda c, r: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(p)

    @jax.jit
    def step(x, p_l):
        def body(x, p):
            y = one(p)
            return x + y * jnp.float32(1e-30), None

        x, _ = jax.lax.scan(body, x, p_l)
        return x

    return step


def chain_time(fn, x0, iters=64, warmup=2):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
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
                    return x + jnp.max(p).astype(jnp.float32) * 1e-30, None
                x, _ = jax.lax.scan(body, x, p_l)
                return x

            fn = lambda x: xstep(x, p_l)  # noqa: E731
            t = min(chain_time(fn, x0, iters=args.iters)
                    for _ in range(args.repeats))
            print(f"{case:>18}: {t*1e3:7.3f} ms/step  "
                  f"{total/t/1e9:6.1f} GB/s  ({total/1e6:.0f} MB/step)")
            continue
        dt_s, shape_s, buf_s = case.split("_")
        tile_r, tile_c = (int(v) for v in shape_s.split("x"))
        dtype = {"i8": jnp.int8, "i32": jnp.int32, "f32": jnp.float32}[dt_s]
        esize = jnp.dtype(dtype).itemsize
        lookahead = buf_s.endswith("la")
        buffers = int(buf_s.rstrip("la").lstrip("b"))

        bytes_per_layer = args.mbytes * 1024 * 1024
        elems = bytes_per_layer // esize
        rows = max(tile_r, (elems // tile_c // tile_r) * tile_r)
        cols = tile_c * 2  # two column tiles like the N sweep
        rows = max(tile_r, rows // 2)
        total = rows * cols * esize * L

        key = jax.random.PRNGKey(0)
        if dtype == jnp.float32:
            p_l = jax.random.normal(key, (L, rows, cols), jnp.float32)
        else:
            p_l = jax.random.randint(key, (L, rows, cols), -100, 100,
                                     jnp.int32).astype(dtype)
        x0 = jnp.zeros((8, 128), jnp.float32)

        step = make_stream_step(rows, cols, tile_r, tile_c, dtype, buffers,
                                lookahead)
        fn = lambda x: step(x, p_l)  # noqa: E731
        try:
            t = min(chain_time(fn, x0, iters=args.iters)
                    for _ in range(args.repeats))
        except Exception as e:  # noqa: BLE001
            print(f"{case:>18}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        print(f"{case:>18}: {t*1e3:7.3f} ms/step  "
              f"{total/t/1e9:6.1f} GB/s  ({total/1e6:.0f} MB/step)")


if __name__ == "__main__":
    main()
