"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4d).

Checks: sharding specs resolve correctly, the sharded quantized forward
matches the single-device forward bit-for-bit-ish, and the sharded train
step runs with STE gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig, OPTConfig
from lqer_tpu.parallel import make_mesh, shard_params
from lqer_tpu.parallel.sharding import spec_for_param
from lqer_tpu.parallel.step import make_train_step

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
    "bmm": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
            "w_quantizer": _q(8, [1, 16], True)},
}
L_CONFIG = {"linear": {"rank": 8}}


class TestShardingRules:
    def test_specs(self):
        assert spec_for_param("model.layers.0.self_attn.q_proj.weight") == P("tp", None)
        assert spec_for_param("model.layers.0.self_attn.o_proj.weight") == P(None, "tp")
        assert spec_for_param("model.layers.0.mlp.down_proj.weight") == P(None, "tp")
        assert spec_for_param("model.layers.0.mlp.up_proj.B") == P(None, "tp")
        assert spec_for_param("model.layers.0.mlp.down_proj.A") == P("tp", None)
        assert spec_for_param("model.layers.0.input_layernorm.weight") == P()
        assert spec_for_param("model.decoder.layers.1.fc1.weight") == P("tp", None)
        assert spec_for_param("model.decoder.layers.1.fc2.weight") == P(None, "tp")
        assert spec_for_param("model.embed_tokens.weight") == P("tp", None)


class TestShardedForwardParity:
    @pytest.mark.parametrize("arch", ["llama", "opt"])
    def test_tp_forward_matches_single_device(self, arch):
        if arch == "llama":
            cfg = LlamaConfig.tiny(vocab_size=256, hidden=64, layers=2, heads=4,
                                   kv_heads=2, inter=128)
        else:
            cfg = OPTConfig.tiny(vocab_size=256, hidden=64, layers=2, heads=4,
                                 ffn=128)
        params = models.init_params(cfg, jax.random.PRNGKey(0))
        qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
        params = models.prepare_ptq(params, cfg, qcfgs)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256)

        ref = np.asarray(models.forward(params, ids, cfg, qcfgs))

        mesh = make_mesh(n_devices=8, tp=4)
        sharded = shard_params(params, mesh)
        fwd = jax.jit(lambda p, i: models.forward(p, i, cfg, qcfgs))
        out = np.asarray(fwd(sharded, ids))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


class TestShardedTrainStep:
    @pytest.mark.slow
    def test_train_step_runs_and_descends(self):
        cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=2, heads=4,
                               kv_heads=2, inter=128)
        q_cfg = {k: dict(v) for k, v in Q_CONFIG.items()}
        q_cfg["linear"] = dict(Q_CONFIG["linear"], is_ptq=False)
        qcfgs = models.quantize_model(cfg, q_cfg, L_CONFIG)
        params = models.init_params(cfg, jax.random.PRNGKey(0))
        # attach A/B so the low-rank path is exercised + trained
        for i in range(cfg.num_hidden_layers):
            for prefix, _ in models.quantizable_module_prefixes(cfg, i):
                out_dim, in_dim = params[prefix + ".weight"].shape
                params[prefix + ".A"] = jnp.zeros((in_dim, 8))
                params[prefix + ".B"] = (
                    jax.random.normal(jax.random.PRNGKey(i), (8, out_dim)) * 0.01
                )

        mesh = make_mesh(n_devices=8, tp=4)
        params = shard_params(params, mesh)
        step = make_train_step(cfg, qcfgs, mesh, lr=1e-2)
        ids = jax.random.randint(jax.random.PRNGKey(2), (4, 16), 0, 128)

        losses = []
        for _ in range(3):
            params, loss = step(params, ids)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # STE gradients actually train
