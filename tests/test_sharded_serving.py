"""Tensor-sharded serving: the decode engine over a (dp=1, tp=4) mesh must
produce the same tokens as single-device serving (BASELINE.json north star:
sharded weights + sharded KV cache serving)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.parallel import make_mesh, shard_params
from lqer_tpu.serving import DecodeEngine, Request

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _q(width, block, skip):
    return {
        "name": "block_fp", "width": width, "exponent_width": 8,
        "exponent_bias": None, "block_size": block, "skip_first_dim": skip,
    }


Q_CONFIG = {
    "linear": {
        "name": "flexible_lqer", "is_ptq": True,
        "x_quantizer": _q(8, [1, 16], True),
        "w_quantizer": _q(4, [1, 16], False),
        "b_quantizer": _q(8, [1, 16], False),
    },
    "matmul": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
               "w_quantizer": _q(8, [1, 16], True)},
}
L_CONFIG = {"linear": {"rank": 8}}


@pytest.mark.slow
def test_sharded_engine_matches_single_device():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=2, heads=4,
                           kv_heads=2, inter=128)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    params = models.prepare_ptq(params, cfg, qcfgs)
    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            out_dim, in_dim = params[prefix + ".weight"].shape
            params[prefix + ".A"] = jnp.zeros((in_dim, 8))
            params[prefix + ".B"] = jax.random.normal(
                jax.random.PRNGKey(i), (8, out_dim)) * 0.01

    reqs_args = dict(max_new_tokens=5)
    prompts = [[3, 17, 42], [9, 8, 7, 6]]

    def run(engine_params):
        engine = DecodeEngine(engine_params, cfg, qcfgs, num_slots=2,
                              max_len=64, cache_dtype=jnp.float32)
        reqs = [Request(prompt_ids=p, **reqs_args) for p in prompts]
        engine.run(reqs)
        return [r.output_ids for r in reqs]

    ref = run(params)

    mesh = make_mesh(n_devices=4, tp=4)
    sharded = shard_params(params, mesh)
    got = run(sharded)

    assert got == ref, (got, ref)

    # dp×tp: KV cache slot axis sharded over dp, heads over tp (the
    # dryrun_multichip serving configuration) — same tokens again
    mesh8 = make_mesh(n_devices=8, tp=4)
    sharded8 = shard_params(params, mesh8)
    engine = DecodeEngine(sharded8, cfg, qcfgs, num_slots=2, max_len=64,
                          cache_dtype=jnp.float32, mesh=mesh8)
    reqs = [Request(prompt_ids=p, **reqs_args) for p in prompts]
    engine.run(reqs)
    assert [r.output_ids for r in reqs] == ref


@pytest.mark.slow
@pytest.mark.parametrize("cache_dtype", ["mxint8", "mxint8-staged",
                                         "mxint4-staged"])
def test_sharded_engine_quantized_cache_matches_single_device(cache_dtype):
    """VERDICT r4 #4: the flagship MXINT8 cache (and its ring-staged round-5
    variant) under a dp×tp mesh — codes/exps (and staging ring) arrays
    sharded with the same slot/kv-head rules as the fp cache; tokens must
    match the single-device quantized-cache engine exactly."""
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=128, layers=2, heads=4,
                           kv_heads=2, inter=128, max_pos=128)
    params = models.init_params(cfg, jax.random.PRNGKey(1))
    qc = Q_CONFIG
    if cache_dtype.startswith("mxint4"):
        qc = dict(Q_CONFIG)
        qc["matmul"] = {"name": "flexible",
                        "x_quantizer": _q(8, [1, 16], True),
                        "w_quantizer": _q(4, [1, 16], True)}
    qcfgs = models.quantize_model(cfg, qc, L_CONFIG)
    params = models.prepare_ptq(params, cfg, qcfgs)

    prompts = [[3, 17, 42], [9, 8, 7, 6]]

    def run(engine_params, mesh=None):
        engine = DecodeEngine(engine_params, cfg, qcfgs, num_slots=2,
                              max_len=128, cache_dtype=cache_dtype,
                              mesh=mesh)
        reqs = [Request(prompt_ids=p, max_new_tokens=5) for p in prompts]
        engine.run(reqs)
        return [r.output_ids for r in reqs]

    ref = run(params)

    mesh = make_mesh(n_devices=4, tp=4)
    assert run(shard_params(params, mesh), mesh=mesh) == ref

    mesh8 = make_mesh(n_devices=8, tp=4)
    assert run(shard_params(params, mesh8), mesh=mesh8) == ref
