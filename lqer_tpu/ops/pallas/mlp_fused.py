"""MLP megakernel: gate|up GEMMs → activation → act-quant → down GEMM as ONE
`pallas_call`, all three linears carrying their LQER low-rank corrections.

The emulated math being fused (reference semantics,
`quantized_layers/linear.py:145-157` per linear plus the decoder's MLP glue,
`llama_decoder.py:62-106` / `opt_decoder.py:212-236`):

    y_g = X W_g^T + q_o(q_a(X A_g) B_g) + b_g
    y_u = X W_u^T + q_o(q_a(X A_u) B_u) + b_u     (gated variant only)
    H   = act(y_g) [* y_u]                         (silu·mul, or relu)
    H_q = x_quantizer(H)                           (MXINT8 groups of 16)
    Y   = H_q W_d^T + q_o(q_a(H_q A_d) B_d) + b_d

Why one launch: per-launch dispatch overhead (~50-80 µs on this
environment's v5e) dominates decode-sized GEMMs — fusing the two MLP
launches plus the XLA elementwise/quantize glue removes a third of each
layer's kernel dispatches AND keeps the (M, I) intermediate in VMEM instead
of an HBM round-trip.

Mechanics: a 1-D grid with two phases. Phase 1 sweeps (i, k) tiles of the
gate/up GEMMs, pairing the same i-tile of gate and up so the activation can
combine them in the epilogue and deposit the quantized intermediate into a
persistent VMEM scratch (M, I). Phase 2 sweeps (n, k2) tiles of the down
GEMM reading that scratch as its contraction operand. Operands not used by
the active phase keep a constant block index, so Pallas never re-fetches
them. VMEM budget: the scratch is M·I·4B (e.g. 8×11264 ≈ 360 KB; cap M at
~128 and fall back to two launches beyond).

Numerics match the two-launch path bit-exactly: identical per-tile MXU dots
in the same k order, identical shared-exponent quantization groups (tile
sizes are multiples of the 16-wide groups).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..storage import MXINT4, MXFormat
from .dequant_gemm import _dot_w4, _quantize_rows_mx, prepare_w4_weights


def _corr(xa_val, b_ref, quant_xa_mb, quant_out_mb, lo=None, hi=None):
    """Low-rank correction epilogue: q_out(q_a(xa) @ B_tile)."""
    if quant_xa_mb is not None:
        xa_val = _quantize_rows_mx(xa_val, quant_xa_mb)
    if lo is not None:
        xa_val = xa_val[:, lo:hi]
    c = jnp.dot(
        xa_val.astype(jnp.bfloat16).astype(jnp.float32),
        b_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if quant_out_mb is not None:
        c = _quantize_rows_mx(c, quant_out_mb)
    return c


def _mlp_kernel(
    # inputs (refs in this order; absent ones dropped by the adapter):
    x_ref, tg_ref, tu_ref, td_ref,
    agu_ref, bg_ref, bu_ref, ad_ref, bd_ref,
    biasg_ref, biasu_ref, biasd_ref,
    o_ref,
    acc_g, acc_u, acc_d, xa_gu, xa_d, inter, xq_scr,
    *, mb, group, gated, act_mb,
    n_i, n_k, n_n, n_k2, tile_i, tile_k, tile_k2,
    rank_gu, rank_d, has_bias,
    quant_xa_mb, quant_out_mb, quant_x_mb=None,
):
    p = pl.program_id(1)
    P1 = n_i * n_k
    in_p1 = p < P1
    k = jnp.where(in_p1, p % n_k, 0)
    i = jnp.where(in_p1, p // n_k, 0)
    j = jnp.where(in_p1, 0, p - P1)
    k2 = j % n_k2
    n = j // n_k2

    # ---------------- phase 1: gate/up GEMMs + activation ----------------
    @pl.when(in_p1)
    def _():
        @pl.when(k == 0)
        def _():
            acc_g[:] = jnp.zeros_like(acc_g)
            if gated:
                acc_u[:] = jnp.zeros_like(acc_u)

        if quant_x_mb is not None:
            # in-kernel activation quantization, quantize-once-per-m-tile
            # into scratch (see dequant_gemm._kernel round-5 v2 note)
            @pl.when(p == 0)
            def _():
                # chunked — see dequant_gemm._kernel (stack-bounded)
                K_full = xq_scr.shape[1]
                for c0 in range(0, K_full, 512):
                    ch = min(512, K_full - c0)
                    xq_scr[:, c0:c0 + ch] = _quantize_rows_mx(
                        x_ref[:, c0:c0 + ch].astype(jnp.float32),
                        quant_x_mb).astype(xq_scr.dtype)

            x = xq_scr[:, pl.ds(k * tile_k, tile_k)]
        else:
            x = x_ref[:]
        acc_g[:] += _dot_w4(x, tg_ref, mb, group, tile_k)
        if gated:
            acc_u[:] += _dot_w4(x, tu_ref, mb, group, tile_k)

        if rank_gu > 0:
            @pl.when(i == 0)
            def _():
                @pl.when(k == 0)
                def _():
                    xa_gu[:] = jnp.zeros_like(xa_gu)

                xa_gu[:] += jnp.dot(
                    x.astype(jnp.float32), agu_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(k == n_k - 1)
        def _():
            y_g = acc_g[:]
            y_u = acc_u[:] if gated else None
            if rank_gu > 0:
                xa_val = xa_gu[:]
                y_g = y_g + _corr(xa_val, bg_ref, quant_xa_mb, quant_out_mb,
                                  lo=0, hi=rank_gu if not gated else rank_gu // 2)
                if gated:
                    y_u = y_u + _corr(xa_val, bu_ref, quant_xa_mb,
                                      quant_out_mb, lo=rank_gu // 2, hi=rank_gu)
            if has_bias:
                y_g = y_g + biasg_ref[:].astype(jnp.float32)
                if gated:
                    y_u = y_u + biasu_ref[:].astype(jnp.float32)
            if gated:
                h = jax.nn.silu(y_g) * y_u
            else:
                h = jnp.maximum(y_g, 0.0)
            if act_mb is not None:
                h = _quantize_rows_mx(h, act_mb)
            inter[:, pl.ds(i * tile_i, tile_i)] = h.astype(inter.dtype)

    # ---------------- phase 2: down GEMM over the VMEM intermediate ------
    @pl.when(jnp.logical_not(in_p1))
    def _():
        @pl.when(k2 == 0)
        def _():
            acc_d[:] = jnp.zeros_like(acc_d)

        h_tile = inter[:, pl.ds(k2 * tile_k2, tile_k2)]
        h_bf = h_tile.astype(jnp.bfloat16)
        acc_d[:] += _dot_w4(h_bf, td_ref, mb, group, tile_k2)

        if rank_d > 0:
            @pl.when(n == 0)
            def _():
                @pl.when(k2 == 0)
                def _():
                    xa_d[:] = jnp.zeros_like(xa_d)

                xa_d[:] += jnp.dot(
                    h_bf.astype(jnp.float32), ad_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(k2 == n_k2 - 1)
        def _():
            r = acc_d[:]
            if rank_d > 0:
                r = r + _corr(xa_d[:], bd_ref, quant_xa_mb, quant_out_mb)
            if has_bias:
                r = r + biasd_ref[:].astype(jnp.float32)
            o_ref[:] = r.astype(o_ref.dtype)


def prepare_mlp_weights(
    w_gate: jnp.ndarray,  # (I, K) — fc1 for the relu variant
    w_up: jnp.ndarray | None,  # (I, K) or None (relu variant)
    w_down: jnp.ndarray,  # (N, I)
    *,
    a_gate=None, b_gate=None, a_up=None, b_up=None, a_down=None, b_down=None,
    bias_gate=None, bias_up=None, bias_down=None,
    fmt: MXFormat = MXINT4,
    tile_k: int = 256,
    tile_k2: int = 256,
    tile_i: int | None = None,
    tile_n: int | None = None,
    pad_i: int | None = None,
) -> dict:
    """Offline prep for :func:`mlp_w4_fused`. A_gate/A_up concatenate along
    rank (shared input ⇒ shared X·A sweep); B stay separate per half.
    ``tile_i``/``tile_n`` fix the tile-major storage's N-side tiling for the
    gate/up and down weights respectively (default: widest divisor ≤ 1024).
    ``pad_i``: zero-pad the intermediate dim to this size before packing
    (tile-friendly grids — `pallas_backend.pad_to_tile`); numerically
    exact, output shape unchanged."""
    gated = w_up is not None
    I = w_gate.shape[0]
    if pad_i is not None and pad_i > I:
        # zero-pad the intermediate dim to a large-tile multiple (see
        # `pallas_backend.pad_to_tile`): pad gate/up OUT rows and down IN
        # columns — zeros are exact through act(0)[*0]=0, the 16-group
        # quantizers' zero passthrough, and the zero down-weight rows.
        p = pad_i - I
        w_gate = jnp.pad(jnp.asarray(w_gate), ((0, p), (0, 0)))
        w_up = None if w_up is None else jnp.pad(jnp.asarray(w_up),
                                                 ((0, p), (0, 0)))
        w_down = jnp.pad(jnp.asarray(w_down), ((0, 0), (0, p)))
        if b_gate is not None:
            b_gate = jnp.pad(jnp.asarray(b_gate), ((0, 0), (0, p)))
        if b_up is not None:
            b_up = jnp.pad(jnp.asarray(b_up), ((0, 0), (0, p)))
        if a_down is not None:
            a_down = jnp.pad(jnp.asarray(a_down), ((0, p), (0, 0)))
        if bias_gate is not None:
            bias_gate = jnp.pad(jnp.asarray(bias_gate), (0, p))
        if bias_up is not None:
            bias_up = jnp.pad(jnp.asarray(bias_up), (0, p))
    pg = prepare_w4_weights(w_gate, bias=bias_gate, fmt=fmt, tile_k=tile_k,
                            tile_n=tile_i)
    pu = (prepare_w4_weights(w_up, bias=bias_up, fmt=fmt, tile_k=tile_k,
                             tile_n=tile_i)
          if gated else None)
    pd = prepare_w4_weights(w_down, bias=bias_down, fmt=fmt, tile_k=tile_k2,
                            tile_n=tile_n)
    a_gu = None
    if a_gate is not None:
        if gated:
            assert a_up is not None and a_gate.shape == a_up.shape
            a_gu = jnp.concatenate(
                [jnp.asarray(a_gate, jnp.bfloat16),
                 jnp.asarray(a_up, jnp.bfloat16)], axis=1)
        else:
            a_gu = jnp.asarray(a_gate, jnp.bfloat16)
    return {
        "gated": gated,
        "fmt": fmt,
        "tile_k": tile_k,
        "tile_k2": tile_k2,
        "tile_i": pg["tile_n"],
        "tile_n": pd["tile_n"],
        "tg": pg["tiles"],
        "tu": None if pu is None else pu["tiles"],
        "td": pd["tiles"],
        "a_gu": a_gu,
        "b_g": None if b_gate is None else jnp.asarray(b_gate, jnp.bfloat16),
        "b_u": None if b_up is None else jnp.asarray(b_up, jnp.bfloat16),
        "a_d": None if a_down is None else jnp.asarray(a_down, jnp.bfloat16),
        "b_d": None if b_down is None else jnp.asarray(b_down, jnp.bfloat16),
        "bias_g": pg["bias"],
        "bias_u": None if pu is None else pu["bias"],
        "bias_d": pd["bias"],
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "mb", "group", "gated", "act_width", "tile_m", "tile_i", "tile_n",
        "tile_k", "tile_k2", "rank_gu", "rank_d", "has_bias",
        "quant_xa_mb", "quant_out_mb", "quant_x_mb", "out_dtype",
        "interpret",
    ),
)
def _mlp_call(
    x_q, tg, tu, td, a_gu, b_g, b_u, a_d, b_d,
    bias_g, bias_u, bias_d,
    *, mb, group, gated, act_width, tile_m, tile_i, tile_n, tile_k, tile_k2,
    rank_gu, rank_d, has_bias, quant_xa_mb, quant_out_mb, out_dtype,
    interpret, quant_x_mb=None, layer_index=None,
):
    """``layer_index``: scalar-prefetch layer selection over LAYER-STACKED
    weight operands (leading L dim) — see ``dequant_gemm._fused_call`` for
    why scan bodies must use this instead of per-layer slices."""
    M, K = x_q.shape
    indexed = layer_index is not None
    I = tg.shape[-3] * tile_i
    N = td.shape[-3] * tile_n
    Sg, Sd = tg.shape[-2], td.shape[-2]
    n_i, n_k = I // tile_i, K // tile_k
    n_n, n_k2 = N // tile_n, I // tile_k2
    P = n_i * n_k + n_n * n_k2
    n_m = M // tile_m

    def c(*idx):
        return tuple(idx)

    specs = []
    args = []

    def add(arr, shape, index_map):
        if indexed:
            f = index_map
            index_map = lambda m, p, idx: f(m, p)  # noqa: E731
        specs.append(pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM))
        args.append(arr)

    def add_w(arr, shape, index_map):
        """Weight-side operand: leading layer dim + idx-prefixed index map
        when layer-indexed."""
        if not indexed:
            return add(arr, shape, index_map)
        f = index_map
        specs.append(pl.BlockSpec(
            (None, *shape), lambda m, p, idx: (idx[0], *f(m, p)),
            memory_space=pltpu.VMEM))
        args.append(arr)

    P1 = n_i * n_k

    def p1_idx(p):
        return jnp.where(p < P1, p % n_k, 0), jnp.where(p < P1, p // n_k, 0)

    def p2_idx(p):
        j = jnp.where(p < P1, 0, p - P1)
        return j % n_k2, j // n_k2

    if quant_x_mb is not None:
        add(x_q.astype(jnp.float32), (tile_m, K), lambda m, p: c(m, 0))
    else:
        add(x_q.astype(jnp.bfloat16), (tile_m, tile_k),
            lambda m, p: c(m, p1_idx(p)[0]))
    add_w(tg, (None, None, Sg, tile_i), lambda m, p: c(*p1_idx(p), 0, 0))
    if gated:
        add_w(tu, (None, None, Sg, tile_i), lambda m, p: c(*p1_idx(p), 0, 0))
    add_w(td, (None, None, Sd, tile_n), lambda m, p: c(*p2_idx(p), 0, 0))
    if rank_gu > 0:
        add_w(a_gu, (tile_k, rank_gu), lambda m, p: c(p1_idx(p)[0], 0))
        add_w(b_g, (b_g.shape[-2], tile_i), lambda m, p: c(0, p1_idx(p)[1]))
        if gated:
            add_w(b_u, (b_u.shape[-2], tile_i),
                  lambda m, p: c(0, p1_idx(p)[1]))
    if rank_d > 0:
        add_w(a_d, (tile_k2, rank_d), lambda m, p: c(p2_idx(p)[0], 0))
        add_w(b_d, (rank_d, tile_n), lambda m, p: c(0, p2_idx(p)[1]))
    if has_bias:
        add_w(bias_g, (1, tile_i), lambda m, p: c(0, p1_idx(p)[1]))
        if gated:
            add_w(bias_u, (1, tile_i), lambda m, p: c(0, p1_idx(p)[1]))
        add_w(bias_d, (1, tile_n), lambda m, p: c(0, p2_idx(p)[1]))

    kernel = functools.partial(
        _mlp_kernel_variant(gated, rank_gu, rank_d, has_bias,
                            drop_scalar=indexed),
        mb=mb, group=group, gated=gated,
        act_mb=None if act_width is None else act_width - 1,
        n_i=n_i, n_k=n_k, n_n=n_n, n_k2=n_k2,
        tile_i=tile_i, tile_k=tile_k, tile_k2=tile_k2,
        rank_gu=rank_gu, rank_d=rank_d, has_bias=has_bias,
        quant_xa_mb=quant_xa_mb, quant_out_mb=quant_out_mb,
        quant_x_mb=quant_x_mb,
    )

    flops = 2 * M * K * I * (2 if gated else 1) + 2 * M * I * N
    bytes_acc = (M * K * 2 + tg.size * (2 if gated else 1)
                 + td.size + M * N * 4)
    out_map = (lambda m, p: c(m, p2_idx(p)[1])) if not indexed else \
        (lambda m, p, idx: c(m, p2_idx(p)[1]))
    scratch_shapes = [
        pltpu.VMEM((tile_m, tile_i), jnp.float32),   # acc_g
        pltpu.VMEM((tile_m, tile_i), jnp.float32),   # acc_u
        pltpu.VMEM((tile_m, tile_n), jnp.float32),   # acc_d
        pltpu.VMEM((tile_m, max(rank_gu, 8)), jnp.float32),  # xa_gu
        pltpu.VMEM((tile_m, max(rank_d, 8)), jnp.float32),   # xa_d
        # intermediate in bf16: EXACT (phase 2 casts to bf16 anyway, and the
        # act-quantized values are <=9-bit-mantissa grids); halves the
        # dominant scratch (the f32 (128, 11264) block pushed the padded-I
        # kernel 180 KB over the 16 MB VMEM budget at prefill)
        pltpu.VMEM((tile_m, I), jnp.bfloat16),       # intermediate
        pltpu.VMEM((tile_m, K if quant_x_mb is not None else 8),
                   jnp.bfloat16),                    # in-kernel-quantized x
    ]
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=bytes_acc, transcendentals=M * I)
    out_spec = pl.BlockSpec((tile_m, tile_n), out_map,
                            memory_space=pltpu.VMEM)
    if indexed:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_m, P),
            in_specs=specs,
            out_specs=out_spec,
            scratch_shapes=scratch_shapes,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(jnp.asarray(layer_index, jnp.int32).reshape(1), *args)
    return pl.pallas_call(
        kernel,
        grid=(n_m, P),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=cost,
        interpret=interpret,
    )(*args)


def _mlp_kernel_variant(gated, rank_gu, rank_d, has_bias,
                        drop_scalar: bool = False):
    """Adapter threading only the present refs into the full signature.
    ``drop_scalar``: a scalar-prefetch layer-index ref arrives first."""

    def k_fn(*refs, **kw):
        refs = list(refs)
        if drop_scalar:
            refs = refs[1:]
        idx = 0

        def take(present):
            nonlocal idx
            if present:
                r = refs[idx]
                idx += 1
                return r
            return None

        x = take(True)
        tg = take(True)
        tu = take(gated)
        td = take(True)
        agu = take(rank_gu > 0)
        bg = take(rank_gu > 0)
        bu = take(rank_gu > 0 and gated)
        ad = take(rank_d > 0)
        bd = take(rank_d > 0)
        biasg = take(has_bias)
        biasu = take(has_bias and gated)
        biasd = take(has_bias)
        o_ref = refs[idx]
        (acc_g, acc_u, acc_d, xa_gu, xa_d, inter,
         xq_scr) = refs[idx + 1:idx + 8]
        return _mlp_kernel(
            x, tg, tu, td, agu, bg, bu, ad, bd,
            biasg, biasu, biasd, o_ref,
            acc_g, acc_u, acc_d, xa_gu, xa_d, inter, xq_scr, **kw,
        )

    return k_fn


def mlp_w4_fused(
    x_q: jnp.ndarray,  # (M, K) activation-quantized input (exact in bf16)
    prep: dict,
    *,
    tile_m: int = 128,
    tile_i: int | None = None,
    tile_n: int | None = None,
    act_width: int | None = 8,
    quant_xa_width: int | None = 8,
    quant_out_width: int | None = 8,
    quant_x_width: int | None = None,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
    layer_index=None,
) -> jnp.ndarray:
    """Run the fused MLP. ``prep`` from :func:`prepare_mlp_weights`.
    ``act_width`` is the down-projection's activation quantizer width applied
    to the intermediate (None disables). ``tile_i``/``tile_n`` are baked into
    the prep's tile-major storage; the kwargs are accepted for interface
    stability and must match when given."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fmt: MXFormat = prep["fmt"]
    M, K = x_q.shape
    for name, given in (("tile_i", tile_i), ("tile_n", tile_n)):
        if given is not None and given != prep[name]:
            raise ValueError(
                f"{name}={given} differs from the prep's tile-major layout "
                f"({prep[name]}); re-pack with prepare_mlp_weights(...)"
            )
    ti, tn = prep["tile_i"], prep["tile_n"]

    tm = min(tile_m, M) if M >= 8 else 8
    I_full = prep["tg"].shape[-3] * ti
    # VMEM guard: the per-m-tile state (bf16 intermediate + f32 gate/up/down
    # accumulators) must leave room for the double-buffered weight slabs —
    # with tile_i=1024 (padded-I layouts) a 128-row tile overflows the 16 MB
    # scoped budget at prefill (measured +748 KB, round 5); halve tile_m
    # until the state fits ~4 MB.
    while tm > 8 and tm * (2 * I_full + 8 * ti + 4 * tn) > 4 * 1024 * 1024:
        tm //= 2
    if M % tm != 0 or M < 8:
        pad = -M % tm if M >= 8 else 8 - M
        x_q = jnp.pad(x_q, ((0, pad), (0, 0)))

    a_gu = prep["a_gu"]
    rank_gu = 0 if a_gu is None else a_gu.shape[-1]
    a_d = prep["a_d"]
    rank_d = 0 if a_d is None else a_d.shape[-1]
    has_bias = prep["bias_g"] is not None
    if layer_index is not None:
        assert prep["tg"].ndim == 5, (
            "layer_index needs layer-stacked prep arrays (leading L dim)"
        )

    out = _mlp_call(
        x_q, prep["tg"], prep["tu"], prep["td"],
        a_gu, prep["b_g"], prep["b_u"],
        a_d, prep["b_d"], prep["bias_g"], prep["bias_u"], prep["bias_d"],
        mb=fmt.mantissa_bits, group=fmt.group_size, gated=prep["gated"],
        act_width=act_width, tile_m=tm, tile_i=ti, tile_n=tn,
        tile_k=prep["tile_k"], tile_k2=prep["tile_k2"],
        rank_gu=rank_gu, rank_d=rank_d, has_bias=has_bias,
        quant_xa_mb=None if quant_xa_width is None else quant_xa_width - 1,
        quant_out_mb=None if quant_out_width is None else quant_out_width - 1,
        quant_x_mb=None if quant_x_width is None else quant_x_width - 1,
        out_dtype=out_dtype, interpret=interpret, layer_index=layer_index,
    )
    return out[:M]


def mlp_w4_dense_largeM(
    x_q: jnp.ndarray,  # (M, K) activation-quantized (exact in bf16)
    prep: dict,
    *,
    act_width: int | None = 8,
    quant_xa_width: int | None = 8,
    quant_out_width: int | None = 8,
    out_dtype=jnp.float32,
    layer_index=None,
) -> jnp.ndarray:
    """Large-M (prefill/eval) MLP: dequantize the packed gate/up/down
    weights once to HBM bf16 and run XLA dense dots (see
    `dequant_gemm.unpack_tiles_to_bf16` — the megakernel refetches and
    re-dequantizes every weight tile once per 128-row M tile). Same math as
    the kernel (identical dequantized weights, `_quantize_rows_mx` partial
    quantizers, in-bf16 intermediate) up to f32 accumulation order."""
    from .dequant_gemm import unpack_tiles_to_bf16

    if layer_index is not None:
        layer_index = jnp.asarray(layer_index, jnp.int32).reshape(())
    fmt: MXFormat = prep["fmt"]
    gated = prep["gated"]
    xa_mb = None if quant_xa_width is None else quant_xa_width - 1
    out_mb = None if quant_out_width is None else quant_out_width - 1

    def unpack(tiles, tile_k, tile_n):
        return unpack_tiles_to_bf16(tiles, tile_k, tile_n, fmt,
                                    layer_index=layer_index)

    def li(a):
        return a if (a is None or layer_index is None) else a[layer_index]

    wg = unpack(prep["tg"], prep["tile_k"], prep["tile_i"])   # (K, I)
    xb = x_q.astype(jnp.bfloat16)
    y_g = jnp.dot(xb, wg, preferred_element_type=jnp.float32)
    y_u = None
    if gated:
        wu = unpack(prep["tu"], prep["tile_k"], prep["tile_i"])
        y_u = jnp.dot(xb, wu, preferred_element_type=jnp.float32)
    a_gu = li(prep["a_gu"])
    if a_gu is not None:
        rank_gu = a_gu.shape[-1]
        xa = jnp.dot(xb.astype(jnp.float32), a_gu.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        if xa_mb is not None:
            xa = _quantize_rows_mx(xa, xa_mb)
        half = rank_gu // 2 if gated else rank_gu

        def corr(xa_part, b):
            c = jnp.dot(xa_part.astype(jnp.bfloat16).astype(jnp.float32),
                        li(b).astype(jnp.float32),
                        preferred_element_type=jnp.float32)
            return _quantize_rows_mx(c, out_mb) if out_mb is not None else c

        y_g = y_g + corr(xa[:, :half], prep["b_g"])
        if gated:
            y_u = y_u + corr(xa[:, half:], prep["b_u"])
    if li(prep["bias_g"]) is not None:
        y_g = y_g + li(prep["bias_g"]).astype(jnp.float32)
        if gated and li(prep["bias_u"]) is not None:
            y_u = y_u + li(prep["bias_u"]).astype(jnp.float32)
    h = jax.nn.silu(y_g) * y_u if gated else jnp.maximum(y_g, 0.0)
    if act_width is not None:
        h = _quantize_rows_mx(h, act_width - 1)

    wd = unpack(prep["td"], prep["tile_k2"], prep["tile_n"])  # (I, N)
    hb = h.astype(jnp.bfloat16)
    y = jnp.dot(hb, wd, preferred_element_type=jnp.float32)
    a_d = li(prep["a_d"])
    if a_d is not None:
        xa_d = jnp.dot(hb.astype(jnp.float32), a_d.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        if xa_mb is not None:
            xa_d = _quantize_rows_mx(xa_d, xa_mb)
        c = jnp.dot(xa_d.astype(jnp.bfloat16).astype(jnp.float32),
                    li(prep["b_d"]).astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        if out_mb is not None:
            c = _quantize_rows_mx(c, out_mb)
        y = y + c
    if li(prep["bias_d"]) is not None:
        y = y + li(prep["bias_d"]).astype(jnp.float32)
    return y.astype(out_dtype)
