"""Software-emulated quantizers (fake-quant) as pure JAX functions.

Functional equivalents of the reference quantizer library
(`/root/reference/src/lqer/quantize/quantizers/`):

* ``block_fp_quantizer``  — MXINT / MSFP shared-exponent blocks
  (`block_fp.py:7-142`)
* ``integer_quantizer``   — fixed point (`integer.py:10-88`)
* ``minifloat_ieee_quantizer`` / ``minifloat_denorm_quantizer``
  (`minifloat.py:7-225`)
* ``passthrough_quantizer`` (`passthrough.py:1-2`)

The reference wraps each in a ``torch.autograd.Function`` whose backward is a
straight-through estimator (identity gradient). Here every public quantizer is
wrapped in ``jax.custom_vjp`` with an identity backward — the idiomatic JAX
form of STE. All math is done in float32 regardless of input dtype (the
reference calibrates/quantizes fp32 state dicts) and the result is cast back
to the input dtype.

Numeric corner cases kept bit-compatible with the reference:

* shared exponent = ``clamp(ceil(log2(per_block_max)), -bias, 2^ew - 1 - bias)``
* all-zero blocks: if *every* block max is 0 the maxes become 1; otherwise
  zero maxes are replaced by the smallest non-zero max (`block_fp.py:39-44`)
* ``sign(x + 1e-9)`` so exact zeros quantize with positive sign, and
  ``|x| + 1e-9`` inside the mantissa (`block_fp.py:55-57`)
* mantissa = ``clamp(round_half_even(m * 2^mb), 0, 2^mb - 1)`` — note the
  max-magnitude element of a block saturates slightly because the integer
  mantissa is clamped to ``2^mb - 1`` (`block_fp.py:53-66`)
* elements with ``|x| <= 1e-8`` pass through unquantized so zero-initialized
  params keep exact zeros (`block_fp.py:77-81`)
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from .blocking import per_block_absmax, unblock

_ZERO_ATOL = 1e-8  # torch.isclose(x, 0) default: |x| <= atol + rtol*0 = 1e-8


def _ste(core: Callable) -> Callable:
    """Wrap ``core(x, **kwargs)`` with a straight-through custom VJP.

    Mirrors the identity-backward autograd.Functions of the reference
    (`block_fp.py:85-108`, `integer.py:46-56`, `minifloat.py:185-197`,
    `utils.py:11-35`).
    """

    @functools.wraps(core)
    def call(x, *args, **kwargs):
        @jax.custom_vjp
        def q(x_):
            return core(x_, *args, **kwargs)

        def fwd(x_):
            return q(x_), None

        def bwd(_, g):
            return (g,)

        q.defvjp(fwd, bwd)
        return q(x)

    return call


def _resolve_exponent_bias(exponent_bias, exponent_width: int) -> int:
    if exponent_bias in (None, "none", "None", "NA"):
        return 2 ** (exponent_width - 1) - 1
    return exponent_bias


def _block_fp_core(
    x: jnp.ndarray,
    width: int = 12,
    exponent_width: int = 8,
    exponent_bias: int | None = None,
    block_size=(16,),
    skip_first_dim: bool = True,
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    v, bmax, eff = per_block_absmax(xf, block_size, skip_first_dim)

    # Zero-block handling (`block_fp.py:39-44`).
    nz_min = jnp.min(jnp.where(bmax != 0, bmax, jnp.inf))
    fill = jnp.where(jnp.isinf(nz_min), jnp.float32(1.0), nz_min)
    bmax = jnp.where(bmax == 0, fill, bmax)

    mantissa_bits = width - 1
    bias = _resolve_exponent_bias(exponent_bias, exponent_width)
    exp_max = 2**exponent_width - 1 - bias
    exp_min = -bias
    mant_int_max = 2**mantissa_bits - 1

    sign = jnp.sign(v + 1e-9)
    value = jnp.abs(v) + 1e-9
    exponent = jnp.clip(jnp.ceil(jnp.log2(bmax)), exp_min, exp_max)
    scale = jnp.exp2(exponent)
    shift = float(2**mantissa_bits)
    mant_int = jnp.clip(jnp.round(value / scale * shift), 0, mant_int_max)
    q_blocked = sign * scale * (mant_int / shift)

    q = unblock(q_blocked, xf.shape, eff)
    # Keep exact zeros exact (`block_fp.py:77-81`).
    is_zero = jnp.abs(xf) <= _ZERO_ATOL
    q = jnp.where(is_zero, xf, q)
    return q.astype(orig_dtype)


def _integer_core(
    x: jnp.ndarray, width: int, frac_width: int, is_signed: bool = True
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if is_signed:
        int_min = -(2 ** (width - 1))
        int_max = 2 ** (width - 1) - 1
    else:
        int_min = 0
        int_max = 2**width - 1
    scale = float(2**frac_width)
    q = jnp.clip(jnp.round(xf * scale), int_min, int_max) / scale
    return q.astype(orig_dtype)


def _minifloat_denorm_core(
    x: jnp.ndarray,
    width: int,
    exponent_width: int,
    exponent_bias: int | None = None,
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    mantissa_bits = width - exponent_width - 1
    bias = _resolve_exponent_bias(exponent_bias, exponent_width)
    exp_max = 2**exponent_width - 1 - bias
    exp_min = -bias
    mant_int_max = 2**mantissa_bits - 1

    sign = jnp.sign(xf + 1e-9)
    value = jnp.abs(xf)
    exponent = jnp.clip(jnp.ceil(jnp.log2(value + 1e-9)), exp_min, exp_max)
    scale = jnp.exp2(exponent)
    shift = float(2**mantissa_bits)
    mant_int = jnp.clip(jnp.round(value / scale * shift), 0, mant_int_max)
    q = sign * scale * (mant_int / shift)

    is_zero = jnp.abs(value) <= _ZERO_ATOL
    q = jnp.where(is_zero, xf, q)
    return q.astype(orig_dtype)


def _minifloat_ieee_core(
    x: jnp.ndarray,
    width: int,
    exponent_width: int,
    exponent_bias: int | None = None,
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    mantissa_bits = width - exponent_width - 1
    bias = _resolve_exponent_bias(exponent_bias, exponent_width)
    exp_max = 2**exponent_width - 1 - bias
    exp_min = -bias
    mant_int_max = 2**mantissa_bits - 1
    shift = float(2**mantissa_bits)

    sign = jnp.sign(xf + 1e-9)
    value = jnp.abs(xf)
    exponent = jnp.clip(jnp.floor(jnp.log2(value + 1e-9)), exp_min, exp_max)
    scale = jnp.exp2(exponent)
    mantissa = value / scale

    # Subnormal branch when the clipped exponent hit the minimum
    # (`minifloat.py:169-177`).
    is_normal = ~jnp.isclose(exponent, jnp.float32(-bias))
    m_normal = jnp.clip(jnp.round(mantissa * shift - shift), 0, mant_int_max)
    m_subnormal = jnp.clip(jnp.round(mantissa * shift / 2), 0, mant_int_max)
    shifted = jnp.where(is_normal, m_normal, m_subnormal)
    mantissa_q = jnp.where(
        is_normal, 1.0 + shifted / shift, shifted / shift * 2.0
    )

    q = sign * scale * mantissa_q
    is_zero = value <= _ZERO_ATOL
    q = jnp.where(is_zero, xf, q)
    return q.astype(orig_dtype)


def integer_fraction(
    width: int, frac_choices, min_value: float, max_value: float
) -> int:
    """Pick a fraction width for a fixed-point format that covers
    ``[min_value, max_value]`` with ``width`` total bits, restricted to
    ``frac_choices`` (`integer.py:81-88`): integer part sized to the max
    half-range (floor-log2 + sign + headroom bit), remainder to fraction."""
    import math

    max_half_range = max(abs(min_value), abs(max_value))
    int_width = int(math.log2(max(0.5, max_half_range))) + 2
    frac_width = max(0, width - int_width)
    return max(filter(lambda c: c <= frac_width, frac_choices))


def passthrough_quantizer(x: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
    """Identity — emulates FP16 activations in W-only configs
    (`passthrough.py:1-2`)."""
    return x


block_fp_quantizer = _ste(_block_fp_core)
integer_quantizer = _ste(_integer_core)
minifloat_denorm_quantizer = _ste(_minifloat_denorm_core)
minifloat_ieee_quantizer = _ste(_minifloat_ieee_core)


_QUANTIZER_MAP = {
    "passthrough": passthrough_quantizer,
    "block_fp": block_fp_quantizer,
    "integer": integer_quantizer,
    "minifloat": minifloat_ieee_quantizer,
    "minifloat_denorm": minifloat_denorm_quantizer,
}


def get_quantizer(name: str) -> Callable:
    """Name → quantizer fn (`quantizers/__init__.py:7-18`)."""
    try:
        return _QUANTIZER_MAP[name]
    except KeyError:
        raise ValueError(f"quantizer {name!r} not supported") from None


_QUANTIZER_CACHE: dict = {}


def make_quantizer(config: dict | None) -> Callable:
    """Build a 1-arg quantizer from a config dict ``{"name": ..., **params}``.

    Functional replacement for the reference's
    ``partial(get_quantizer(cfg.pop("name")), **cfg)`` idiom
    (`quantized_layers/linear.py:89-106`).

    Identical configs return the SAME memoized, jitted callable — so the
    dozens of per-layer quantizer invocations (PTQ prep, calibration, eval)
    share one compilation per distinct (config, shape) instead of
    re-tracing per layer (at 1-4 min/compile through this environment's
    remote-compile relay, that's the difference between seconds and many
    minutes of model setup).
    """
    if config is None:
        return passthrough_quantizer
    cfg = dict(config)
    name = cfg.pop("name")
    fn = get_quantizer(name)
    if fn is passthrough_quantizer:
        return passthrough_quantizer

    key = (name, tuple(sorted((k, repr(v)) for k, v in cfg.items())))
    cached = _QUANTIZER_CACHE.get(key)
    if cached is None:
        cached = jax.jit(functools.partial(fn, **cfg))
        _QUANTIZER_CACHE[key] = cached
    return cached
