"""Unit tests for the quantizer numerics core.

Three layers of checking (SURVEY.md §4):
1. hand-computed bit patterns for each format;
2. property tests (idempotence, zero handling, block structure);
3. bit-exact parity against the reference torch implementation imported in
   place from /root/reference (skipped if the mount/torch are unavailable).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqer_tpu.ops import (
    block_fp_quantizer,
    integer_quantizer,
    minifloat_denorm_quantizer,
    minifloat_ieee_quantizer,
    passthrough_quantizer,
    get_quantizer,
    make_quantizer,
)
from lqer_tpu.ops.blocking import infer_block_shape

from ref_oracle import load_reference_quantizers

REF = load_reference_quantizers()


# ---------------------------------------------------------------------------
# infer_block_shape
# ---------------------------------------------------------------------------
class TestInferBlockShape:
    def test_right_align_and_clamp(self):
        assert infer_block_shape((4, 32), [1, 16]) == [1, 16]
        assert infer_block_shape((4, 8), [1, 16]) == [1, 8]
        assert infer_block_shape((32,), [1, 16]) == [16]
        assert infer_block_shape((4, 32), [16]) == [4, 16]  # prepend -1

    def test_minus_one_means_whole_dim(self):
        assert infer_block_shape((4, 32), [1, -1]) == [1, 32]
        assert infer_block_shape((4, 32), [-1, -1]) == [4, 32]

    def test_skip_first_dim(self):
        assert infer_block_shape((7, 32), [1, 16], skip_first_dim=True) == [1, 16]
        assert infer_block_shape((7, 32), [16, 16], skip_first_dim=True) == [1, 16]
        assert infer_block_shape((2, 9, 32), [1, 16], skip_first_dim=True) == [1, 1, 16]


# ---------------------------------------------------------------------------
# block_fp (MXINT)
# ---------------------------------------------------------------------------
class TestBlockFP:
    def test_hand_computed_simple_block(self):
        # One block of 4, width=4 (3 mantissa bits), exponent_width=8.
        # max=1.0 -> exponent=ceil(log2(1))=0 -> scale=1
        # mantissa_int = clamp(round(v*8), 0, 7)
        x = jnp.array([[1.0, 0.5, 0.25, -0.3]])
        q = block_fp_quantizer(
            x, width=4, exponent_width=8, block_size=[1, 4], skip_first_dim=False
        )
        # 1.0 -> round(8.000000008)=8 -> clamp 7 -> 0.875 (max saturates)
        # 0.5 -> round(4.0...)=4 -> 0.5
        # 0.25 -> 2/8 = 0.25
        # -0.3 -> sign=-1, round(0.300000001*8)=round(2.4)=2 -> -0.25
        np.testing.assert_allclose(
            np.asarray(q), [[0.875, 0.5, 0.25, -0.25]], atol=1e-7
        )

    def test_shared_exponent_is_per_block(self):
        # Two blocks of 2 with very different magnitude.
        x = jnp.array([[4.0, 1.0, 0.125, 0.0625]])
        q = block_fp_quantizer(
            x, width=8, exponent_width=8, block_size=[1, 2], skip_first_dim=False
        )
        # block 0: max 4 -> exp 2, block 1: max 0.125 -> exp -3
        q = np.asarray(q)
        np.testing.assert_allclose(q[0, 1], 1.0, atol=1e-6)
        np.testing.assert_allclose(q[0, 3], 0.0625, atol=1e-7)

    def test_zero_passthrough(self):
        x = jnp.zeros((2, 16))
        q = block_fp_quantizer(x, width=4, exponent_width=8, block_size=[1, 16])
        np.testing.assert_array_equal(np.asarray(q), np.zeros((2, 16)))

    def test_mixed_zero_blocks(self):
        x = jnp.array([[0.0, 0.0], [1.0, 0.5]])
        q = block_fp_quantizer(
            x, width=8, exponent_width=8, block_size=[1, 2], skip_first_dim=False
        )
        q = np.asarray(q)
        np.testing.assert_array_equal(q[0], [0.0, 0.0])
        # block max saturates: mantissa clamped to 2^7-1 -> 127/128
        np.testing.assert_allclose(q[1], [127.0 / 128.0, 0.5], atol=1e-6)

    def test_second_pass_stable(self):
        # block_fp is NOT idempotent (the reference isn't either: a block max
        # like 2.0 saturates to 31/32*2 on requantization because the integer
        # mantissa clamps to 2^m-1), but it reaches a fixed point on the
        # second pass.
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (8, 64))
        kw = dict(width=6, exponent_width=8, block_size=[1, 16], skip_first_dim=False)
        q2 = block_fp_quantizer(block_fp_quantizer(x, **kw), **kw)
        q3 = block_fp_quantizer(q2, **kw)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q3), atol=1e-6)

    def test_ste_gradient_is_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))

        def f(x):
            return jnp.sum(
                block_fp_quantizer(x, width=4, exponent_width=8, block_size=[1, 16])
            )

        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), np.ones_like(g), atol=1e-6)

    def test_padding_non_multiple_dim(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 37))
        q = block_fp_quantizer(
            x, width=8, exponent_width=8, block_size=[1, 16], skip_first_dim=False
        )
        assert q.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(q)))

    def test_jit_compatible(self):
        f = jax.jit(
            lambda x: block_fp_quantizer(
                x, width=4, exponent_width=8, block_size=[1, 16]
            )
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 32))
        np.testing.assert_allclose(
            np.asarray(f(x)),
            np.asarray(
                block_fp_quantizer(x, width=4, exponent_width=8, block_size=[1, 16])
            ),
            atol=1e-7,
        )


# ---------------------------------------------------------------------------
# integer
# ---------------------------------------------------------------------------
class TestInteger:
    def test_hand_computed(self):
        x = jnp.array([0.1, -0.1, 3.9, -5.0])
        q = integer_quantizer(x, width=4, frac_width=1, is_signed=True)
        # scale=2; ints clamp to [-8, 7]
        # 0.1*2=0.2 -> 0 -> 0.0 ; -0.1 -> -0.0
        # 3.9*2=7.8 -> 8 -> clamp 7 -> 3.5
        # -5*2=-10 -> clamp -8 -> -4.0
        np.testing.assert_allclose(np.asarray(q), [0.0, 0.0, 3.5, -4.0], atol=1e-7)

    def test_unsigned(self):
        x = jnp.array([-1.0, 0.3, 10.0])
        q = integer_quantizer(x, width=4, frac_width=0, is_signed=False)
        np.testing.assert_allclose(np.asarray(q), [0.0, 0.0, 10.0], atol=1e-7)

    def test_round_half_even(self):
        x = jnp.array([0.5, 1.5, 2.5, -0.5])
        q = integer_quantizer(x, width=8, frac_width=0)
        np.testing.assert_allclose(np.asarray(q), [0.0, 2.0, 2.0, -0.0], atol=1e-7)

    def test_ste(self):
        x = jnp.array([0.3, 1.7])
        g = jax.grad(lambda x: jnp.sum(integer_quantizer(x, 8, 4)))(x)
        np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])


# ---------------------------------------------------------------------------
# minifloat
# ---------------------------------------------------------------------------
class TestMinifloat:
    def test_ieee_hand_computed(self):
        # width=8, ew=4, mb=3, bias=7. x=1.5: exp=floor(log2(1.5))=0 normal,
        # mantissa=1.5 -> round(1.5*8-8)=4 -> 1+4/8=1.5
        q = minifloat_ieee_quantizer(jnp.array([1.5]), 8, 4)
        np.testing.assert_allclose(np.asarray(q), [1.5], atol=1e-7)

    def test_ieee_saturation(self):
        # exp_max = 15-7 = 8 -> max = 2^8 * (1+7/8) = 480
        q = minifloat_ieee_quantizer(jnp.array([1e9]), 8, 4)
        np.testing.assert_allclose(np.asarray(q), [480.0], atol=1e-4)

    def test_ieee_subnormal(self):
        # exp_min=-7; x = 2^-9 clips exponent to -7 -> subnormal
        # mantissa = 2^-9/2^-7 = 0.25 -> round(0.25*8/2)=1 -> 1/8*2 = 0.25
        # value = 2^-7 * 0.25 = 2^-9
        q = minifloat_ieee_quantizer(jnp.array([2.0**-9]), 8, 4)
        np.testing.assert_allclose(np.asarray(q), [2.0**-9], atol=1e-9)

    def test_denorm_hand_computed(self):
        # denorm: exp=ceil(log2(v)), mantissa in (0.5, 1]
        # x=1.5: exp=1, mantissa=0.75 -> round(0.75*8)=6 -> 6/8 * 2 = 1.5
        q = minifloat_denorm_quantizer(jnp.array([1.5]), 8, 4)
        np.testing.assert_allclose(np.asarray(q), [1.5], atol=1e-7)

    def test_zero(self):
        for fn in (minifloat_ieee_quantizer, minifloat_denorm_quantizer):
            q = fn(jnp.array([0.0]), 8, 4)
            np.testing.assert_array_equal(np.asarray(q), [0.0])


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------
class TestRegistry:
    def test_get_quantizer_names(self):
        assert get_quantizer("block_fp") is block_fp_quantizer
        assert get_quantizer("integer") is integer_quantizer
        assert get_quantizer("minifloat") is minifloat_ieee_quantizer
        assert get_quantizer("passthrough") is passthrough_quantizer
        with pytest.raises(ValueError):
            get_quantizer("nope")

    def test_make_quantizer(self):
        q = make_quantizer(
            {
                "name": "block_fp",
                "width": 4,
                "exponent_width": 8,
                "exponent_bias": None,
                "block_size": [1, 16],
                "skip_first_dim": False,
            }
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
        ref = block_fp_quantizer(
            x, width=4, exponent_width=8, block_size=[1, 16], skip_first_dim=False
        )
        np.testing.assert_allclose(np.asarray(q(x)), np.asarray(ref), atol=1e-7)

    def test_make_quantizer_passthrough(self):
        q = make_quantizer({"name": "passthrough", "width": 8})
        x = jnp.ones((3,))
        assert q(x) is x


# ---------------------------------------------------------------------------
# parity vs the reference torch implementation (oracle)
# ---------------------------------------------------------------------------
needs_ref = pytest.mark.skipif(REF is None, reason="reference mount or torch missing")


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    # mixture of scales + exact zeros to hit corner cases
    x = rng.standard_normal(shape).astype(np.float32)
    x *= 10.0 ** rng.integers(-3, 3, size=shape)
    mask = rng.random(shape) < 0.05
    x[mask] = 0.0
    return x


@needs_ref
class TestParityBlockFP:
    @pytest.mark.parametrize(
        "shape,block,skip",
        [
            ((64, 96), [1, 16], False),   # W4A8 weight blocking
            ((64, 96), [16, 1], False),   # A/B factor blocking
            ((64, 96), [1, -1], False),   # per-row "INT" emulation
            ((7, 33), [1, 16], False),    # padding path
            ((5, 48), [1, 16], True),     # 2D activation
            ((2, 9, 48), [1, 16], True),  # 3D activation
            ((33,), [16], False),         # bias
            ((64, 96), [4, 8], False),    # true 2D blocks
        ],
    )
    @pytest.mark.parametrize("width", [3, 4, 8])
    def test_block_fp_parity(self, shape, block, skip, width):
        import torch

        x = _rand(shape, seed=hash((shape, tuple(block), skip, width)) % 2**31)
        ours = np.asarray(
            block_fp_quantizer(
                jnp.asarray(x),
                width=width,
                exponent_width=8,
                exponent_bias=None,
                block_size=list(block),
                skip_first_dim=skip,
            )
        )
        theirs = (
            REF.block_fp.block_fp_quantizer(
                torch.from_numpy(x),
                width=width,
                exponent_width=8,
                exponent_bias=None,
                block_size=list(block),
                skip_first_dim=skip,
            )
            .detach()
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)

    def test_all_zero_parity(self):
        import torch

        x = np.zeros((4, 32), dtype=np.float32)
        ours = np.asarray(
            block_fp_quantizer(jnp.asarray(x), width=4, exponent_width=8,
                               block_size=[1, 16], skip_first_dim=False)
        )
        theirs = REF.block_fp.block_fp_quantizer(
            torch.from_numpy(x), width=4, exponent_width=8,
            block_size=[1, 16], skip_first_dim=False,
        ).numpy()
        np.testing.assert_array_equal(ours, theirs)


@needs_ref
class TestParityOther:
    @pytest.mark.parametrize("width,frac", [(8, 4), (4, 1), (16, 8)])
    @pytest.mark.parametrize("signed", [True, False])
    def test_integer_parity(self, width, frac, signed):
        import torch

        x = _rand((37, 53), seed=width * 100 + frac)
        ours = np.asarray(
            integer_quantizer(jnp.asarray(x), width, frac, is_signed=signed)
        )
        theirs = REF.integer.integer_quantizer(
            torch.from_numpy(x), width, frac, is_signed=signed
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)

    @pytest.mark.parametrize(
        "width,lo,hi", [(8, -3.0, 7.5), (8, -0.2, 0.4), (16, -300.0, 10.0)]
    )
    def test_integer_fraction_parity(self, width, lo, hi):
        from lqer_tpu.ops import integer_fraction

        choices = [0, 1, 2, 4, 8, 12]
        ours = integer_fraction(width, choices, lo, hi)
        theirs = REF.integer.integer_fraction(width, choices, lo, hi)
        assert ours == theirs

    @pytest.mark.parametrize("width,ew", [(8, 4), (8, 3), (6, 3)])
    def test_minifloat_ieee_parity(self, width, ew):
        import torch

        x = _rand((37, 53), seed=width * 10 + ew)
        ours = np.asarray(minifloat_ieee_quantizer(jnp.asarray(x), width, ew))
        theirs = REF.minifloat.minifloat_ieee_quantizer(
            torch.from_numpy(x), width, ew
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-12)

    @pytest.mark.parametrize("width,ew", [(8, 4), (6, 3)])
    def test_minifloat_denorm_parity(self, width, ew):
        import torch

        x = _rand((37, 53), seed=width * 10 + ew + 7)
        ours = np.asarray(minifloat_denorm_quantizer(jnp.asarray(x), width, ew))
        theirs = REF.minifloat.minifloat_denorm_quantizer(
            torch.from_numpy(x), width, ew
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-12)
