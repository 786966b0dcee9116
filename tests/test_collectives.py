"""Quantized-collective tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lqer_tpu.ops import block_fp_quantizer
from lqer_tpu.parallel.collectives import (
    mx8_decode,
    mx8_encode,
    quantized_all_gather,
    quantized_psum_scatter,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh():
    import numpy as _np

    return Mesh(_np.asarray(jax.devices()[:8]), axis_names=("tp",))


class TestMX8Codec:
    def test_roundtrip_matches_block_fp(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
        codes, exps = mx8_encode(x)
        out = mx8_decode(codes, exps)
        ref = block_fp_quantizer(
            x, width=8, exponent_width=8, block_size=[1, 16],
            skip_first_dim=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-7)

    def test_wire_bytes(self):
        x = jnp.ones((8, 64))
        codes, exps = mx8_encode(x)
        wire = codes.size * 1 + exps.size * 1
        assert wire == 64 * 8 + 4 * 8  # 8.5 bits/value vs 16 for bf16


class TestQuantizedAllGather:
    @pytest.mark.slow
    def test_matches_plain_gather_of_quantized(self):
        mesh = _mesh()
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 64))

        qag = shard_map(
            lambda x: quantized_all_gather(x, "tp"),
            mesh=mesh,
            in_specs=P("tp", None),
            out_specs=P(None, None),
            check_vma=False,
        )
        out = np.asarray(qag(x))
        assert out.shape == (16, 64)

        # oracle: per-shard quantize then gather
        shards = np.split(np.asarray(x), 8, axis=0)
        ref = np.concatenate([
            np.asarray(block_fp_quantizer(
                jnp.asarray(s), width=8, exponent_width=8,
                block_size=[1, 16], skip_first_dim=True,
            ))
            for s in shards
        ], axis=0)
        np.testing.assert_allclose(out, ref, atol=1e-7)


class TestQuantizedPsumScatter:
    @pytest.mark.slow
    def test_close_to_exact_reduce_scatter(self):
        mesh = _mesh()
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 64))

        qrs = shard_map(
            lambda x: quantized_psum_scatter(x[0], "tp"),
            mesh=mesh,
            in_specs=P("tp", None, None),
            out_specs=P("tp", None),
        )
        out = np.asarray(qrs(x))
        assert out.shape == (32, 64)

        # exact reduce-scatter for comparison
        full_sum = np.asarray(x).sum(axis=0)  # (32, 64)
        chunks = np.split(full_sum, 8, axis=0)
        ref = np.concatenate(chunks, axis=0)
        # hop-wise 8-bit requantization: relative error ~ per-hop quantization
        err = np.abs(out - ref)
        rel = err.max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05, rel
