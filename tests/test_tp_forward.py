"""Explicit shard_map TP forward + quantized collectives on the wire.

8-virtual-device CPU mesh (conftest). Checks, per VERDICT round-1 item 5:
(a) the shard_map TP forward matches the single-device forward exactly with
plain psum and within the MX8-wire-quantization bound with quantized
collectives; (b) the compiled HLO actually moves int8 payloads (codes+exps)
through the collectives instead of f32/bf16.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.parallel import make_mesh, shard_params
from lqer_tpu.parallel.tp_forward import make_tp_forward


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
L_CONFIG = {"linear": {"rank": 16}}


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny(vocab_size=64, hidden=64, layers=2, heads=4,
                           kv_heads=4, inter=128, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            out_dim, in_dim = params[prefix + ".weight"].shape
            params[prefix + ".A"] = jax.random.normal(
                jax.random.PRNGKey(i + 5), (in_dim, 16)) * 0.01
            params[prefix + ".B"] = jax.random.normal(
                jax.random.PRNGKey(i + 9), (16, out_dim)) * 0.01
    params = models.prepare_ptq(params, cfg, qcfgs)
    mesh = make_mesh(8, tp=4)
    sharded = shard_params(params, mesh)
    ids = jnp.asarray(
        np.random.RandomState(3).randint(0, 64, size=(2, 12)), jnp.int32)
    ref = np.asarray(models.forward(params, ids, cfg, qcfgs))
    return cfg, qcfgs, params, sharded, mesh, ids, ref


def test_tp_forward_exact_collectives(setup):
    cfg, qcfgs, _, sharded, mesh, ids, ref = setup
    fwd = make_tp_forward(cfg, qcfgs, mesh, quantized_collectives=False)
    out = np.asarray(fwd(sharded, ids))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_tp_forward_quantized_collectives(setup):
    cfg, qcfgs, _, sharded, mesh, ids, ref = setup
    fwd = make_tp_forward(cfg, qcfgs, mesh, quantized_collectives=True)
    out = np.asarray(fwd(sharded, ids))
    # wire quantization adds (tp-1) MXINT8 quantizations of partial sums per
    # row-parallel reduction; on this tiny model logits stay close and
    # predictions agree
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.15)
    np.testing.assert_array_equal(out.argmax(-1), ref.argmax(-1))


def test_quantized_collectives_move_int8(setup):
    """The wire payloads must be s8 (codes + exps), not f32/bf16: find the
    collective-permute ops in the optimized HLO and check their operand
    dtypes. The exact-psum variant must NOT contain s8 collectives."""
    cfg, qcfgs, _, sharded, mesh, ids, _ = setup

    def hlo(quantized):
        fwd = make_tp_forward(cfg, qcfgs, mesh,
                              quantized_collectives=quantized)
        return jax.jit(fwd).lower(sharded, ids).compile().as_text()

    q_text = hlo(True)
    perms = re.findall(r"s8\[[^\]]*\][^\n]*collective-permute", q_text)
    assert perms, "expected s8 collective-permute ops in the quantized TP HLO"
    x_text = hlo(False)
    assert not re.findall(r"s8\[[^\]]*\][^\n]*collective-permute", x_text)


def test_tp_forward_rejects_indivisible():
    cfg = LlamaConfig.tiny(vocab_size=62, hidden=48, layers=1, heads=3,
                           kv_heads=3, inter=96, max_pos=32)
    mesh = make_mesh(8, tp=4)
    with pytest.raises(ValueError):
        make_tp_forward(cfg, None, mesh)


# ---------------------------------------------------------------------------
# OPT family (round-3 VERDICT item 5: lift the Llama-only restriction)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def setup_opt():
    from lqer_tpu.models import OPTConfig

    cfg = OPTConfig.tiny(vocab_size=64, hidden=64, layers=2, heads=4,
                         ffn=128, max_pos=64)
    params = models.init_params(cfg, jax.random.PRNGKey(1))
    q_config = {  # OPT q_configs key the attention matmuls "bmm" (ref parity)
        "linear": Q_CONFIG["linear"],
        "bmm": Q_CONFIG["matmul"],
    }
    qcfgs = models.quantize_model(cfg, q_config, L_CONFIG)
    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            out_dim, in_dim = params[prefix + ".weight"].shape
            params[prefix + ".A"] = jax.random.normal(
                jax.random.PRNGKey(i + 15), (in_dim, 16)) * 0.01
            params[prefix + ".B"] = jax.random.normal(
                jax.random.PRNGKey(i + 19), (16, out_dim)) * 0.01
    params = models.prepare_ptq(params, cfg, qcfgs)
    mesh = make_mesh(8, tp=4)
    sharded = shard_params(params, mesh)
    ids = jnp.asarray(
        np.random.RandomState(7).randint(0, 64, size=(2, 12)), jnp.int32)
    ref = np.asarray(models.forward(params, ids, cfg, qcfgs))
    return cfg, qcfgs, sharded, mesh, ids, ref


def test_opt_tp_forward_exact_collectives(setup_opt):
    cfg, qcfgs, sharded, mesh, ids, ref = setup_opt
    fwd = make_tp_forward(cfg, qcfgs, mesh, quantized_collectives=False)
    out = np.asarray(fwd(sharded, ids))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_opt_tp_forward_quantized_collectives(setup_opt):
    cfg, qcfgs, sharded, mesh, ids, ref = setup_opt
    fwd = make_tp_forward(cfg, qcfgs, mesh, quantized_collectives=True)
    out = np.asarray(fwd(sharded, ids))
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.15)
    # argmax must agree wherever the reference's top-1 margin exceeds the
    # wire-quantization noise (random tiny models have near-tie positions)
    top2 = np.sort(ref, axis=-1)[..., -2:]
    margin = top2[..., 1] - top2[..., 0]
    confident = margin > 0.1
    assert confident.sum() > 0
    np.testing.assert_array_equal(out.argmax(-1)[confident],
                                  ref.argmax(-1)[confident])


def test_opt_350m_projection_rejected():
    from lqer_tpu.models import OPTConfig

    cfg = OPTConfig(vocab_size=64, hidden_size=64, ffn_dim=128,
                    num_hidden_layers=1, num_attention_heads=4,
                    max_position_embeddings=64, word_embed_proj_dim=32)
    mesh = make_mesh(8, tp=4)
    with pytest.raises(NotImplementedError):
        make_tp_forward(cfg, None, mesh)
