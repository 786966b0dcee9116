"""AWQ/GPTQ checkpoint dequantization (dequantize-to-fp baselines,
`/root/reference/experiments/baselines/baseline.py:93-109` parity rows)."""

import numpy as np
import pytest

from lqer_tpu.models.quant_checkpoints import (
    dequantize_awq_weight,
    dequantize_checkpoint,
    dequantize_gptq_weight,
    pack_awq_weight,
    pack_gptq_weight,
)


def _random_w(out_f=24, in_f=256, seed=0):
    return np.random.RandomState(seed).randn(out_f, in_f).astype(np.float32)


@pytest.mark.parametrize("group_size", [64, 128])
@pytest.mark.parametrize("zero_offset", [True, False])
def test_gptq_roundtrip(group_size, zero_offset):
    w = _random_w()
    qweight, qzeros, scales, g_idx = pack_gptq_weight(
        w, group_size=group_size, zero_offset=zero_offset)
    assert qweight.dtype == np.int32
    assert qweight.shape == (w.shape[1] // 8, w.shape[0])
    deq = dequantize_gptq_weight(qweight, qzeros, scales, g_idx,
                                 zero_offset=zero_offset)
    assert deq.shape == w.shape
    # 4-bit asymmetric min-max: error bounded by half a step per group
    step = (w.max() - w.min()) / 15.0
    assert np.max(np.abs(deq - w)) <= step
    # and the decode must be exact w.r.t. the packed representation:
    # re-packing the dequantized weight reproduces identical tensors
    qw2, qz2, sc2, _ = pack_gptq_weight(deq, group_size=group_size,
                                        zero_offset=zero_offset)
    deq2 = dequantize_gptq_weight(qw2, qz2, sc2, g_idx,
                                  zero_offset=zero_offset)
    np.testing.assert_allclose(deq2, deq, atol=1e-5)


def test_gptq_act_order_g_idx():
    """GPTQ act-order checkpoints permute the group index; dequantization
    must follow g_idx rather than assume contiguous groups."""
    w = _random_w(16, 128, seed=3)
    qweight, qzeros, scales, g_idx = pack_gptq_weight(w, group_size=64)
    perm = np.random.RandomState(1).permutation(128)
    deq_base = dequantize_gptq_weight(qweight, qzeros, scales, g_idx)
    deq_perm = dequantize_gptq_weight(qweight, qzeros, scales, g_idx[perm])
    # same codes, permuted group assignment -> different result unless the
    # permutation is group-preserving
    assert not np.allclose(deq_base, deq_perm)


@pytest.mark.parametrize("group_size", [64, 128])
def test_awq_roundtrip(group_size):
    w = _random_w(32, 256, seed=5)
    qweight, qzeros, scales = pack_awq_weight(w, group_size=group_size)
    assert qweight.shape == (w.shape[1], w.shape[0] // 8)
    deq = dequantize_awq_weight(qweight, qzeros, scales)
    assert deq.shape == w.shape
    step = (w.max() - w.min()) / 15.0
    assert np.max(np.abs(deq - w)) <= step


def test_dequantize_checkpoint_mixed():
    """Full checkpoint dict: packed modules decode to .weight, everything
    else passes through untouched."""
    w1 = _random_w(16, 128, seed=7)
    w2 = _random_w(24, 128, seed=8)
    qw, qz, sc, gi = pack_gptq_weight(w1, group_size=64)
    emb = np.random.RandomState(9).randn(50, 16).astype(np.float32)
    bias = np.zeros(16, np.float32)
    tensors = {
        "model.layers.0.self_attn.q_proj.qweight": qw,
        "model.layers.0.self_attn.q_proj.qzeros": qz,
        "model.layers.0.self_attn.q_proj.scales": sc,
        "model.layers.0.self_attn.q_proj.g_idx": gi,
        "model.layers.0.self_attn.q_proj.bias": bias,
        "model.embed_tokens.weight": emb,
    }
    qw2, qz2, sc2 = pack_awq_weight(w2, group_size=64)
    tensors.update({
        "model.layers.0.mlp.up_proj.qweight": qw2,
        "model.layers.0.mlp.up_proj.qzeros": qz2,
        "model.layers.0.mlp.up_proj.scales": sc2,
    })
    # gptq and awq dicts decode separately (a real checkpoint is one format)
    out = dequantize_checkpoint(
        {k: v for k, v in tensors.items() if "up_proj" not in k}, "gptq")
    assert out["model.layers.0.self_attn.q_proj.weight"].shape == w1.shape
    np.testing.assert_array_equal(out["model.embed_tokens.weight"], emb)
    np.testing.assert_array_equal(
        out["model.layers.0.self_attn.q_proj.bias"], bias)
    assert not any(k.endswith(".qweight") for k in out)

    out2 = dequantize_checkpoint(
        {k: v for k, v in tensors.items() if "up_proj" in k}, "awq")
    assert out2["model.layers.0.mlp.up_proj.weight"].shape == w2.shape


def test_dequantized_forward_runs():
    """End-to-end: pack a tiny OPT's linears as GPTQ, dequantize, and check
    the fp forward on dequantized weights tracks the original closely."""
    import jax
    import jax.numpy as jnp

    from lqer_tpu import models
    from lqer_tpu.models import OPTConfig

    cfg = OPTConfig.tiny(vocab_size=128, hidden=64, layers=1, heads=4, ffn=128)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    tensors = {}
    for name, arr in params.items():
        a = np.asarray(arr)
        is_linear_w = name.endswith(".weight") and a.ndim == 2 and (
            "self_attn" in name or ".fc" in name)
        if is_linear_w:
            mod = name[: -len(".weight")]
            qw, qz, sc, gi = pack_gptq_weight(a, group_size=32)
            tensors[mod + ".qweight"] = qw
            tensors[mod + ".qzeros"] = qz
            tensors[mod + ".scales"] = sc
            tensors[mod + ".g_idx"] = gi
        else:
            tensors[name] = a
    fp = dequantize_checkpoint(tensors, "gptq")
    assert set(fp) == set(params)
    deq_params = {k: jnp.asarray(v) for k, v in fp.items()}
    ids = jnp.asarray([[3, 17, 42, 9]], dtype=jnp.int32)
    ref = np.asarray(models.forward(params, ids, cfg, None))
    out = np.asarray(models.forward(deq_params, ids, cfg, None))
    # 4-bit weight quantization error only
    assert np.argmax(out[0, -1]) == np.argmax(ref[0, -1])
