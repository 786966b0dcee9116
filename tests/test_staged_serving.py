"""Staged-cache serving integration: model_step/engine parity vs the plain
MXINT8 cache across flush boundaries, eager fallback, and admission
boundary sync."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lqer_tpu import models
from lqer_tpu.models import LlamaConfig
from lqer_tpu.serving import DecodeEngine, Request
from lqer_tpu.serving import decode as dec
from lqer_tpu.serving.pallas_backend import prepare_serving_params


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
MAX_LEN = 128


def _model(seed=0, with_backend=True):
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=2, heads=4,
                           kv_heads=2, inter=256, max_pos=MAX_LEN)
    params = models.init_params(cfg, jax.random.PRNGKey(seed))
    qcfgs = models.quantize_model(cfg, Q_CONFIG, {"linear": {"rank": 16}})
    backend = prepare_serving_params(params, cfg, qcfgs) if with_backend \
        else None
    params = models.prepare_ptq(params, cfg, qcfgs)
    return cfg, params, qcfgs, backend


def _decode_trajectory(cfg, params, qcfgs, backend, cache_dtype, steps,
                       prompt_len=7):
    """Admission prefill + ``steps`` greedy decode steps through model_step;
    returns (logit trajectory, final cache)."""
    ids = (jnp.arange(prompt_len)[None, :] * 3 + 1) % 128
    ids = jnp.tile(ids, (2, 1))
    cache = dec.make_cache(cfg, 2, MAX_LEN, cache_dtype)
    pos = jnp.zeros((2,), jnp.int32)
    logits, cache = dec.model_step(params, ids, cache, pos, cfg, qcfgs,
                                   backend=backend)
    pos = pos + prompt_len
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
    traj = []
    for _ in range(steps):
        logits, cache = dec.model_step(params, tok[:, None], cache, pos,
                                       cfg, qcfgs, backend=backend)
        traj.append(np.asarray(logits[:, 0, :], np.float32))
        tok = jnp.argmax(logits[:, 0, :], -1).astype(jnp.int32)
        pos = pos + 1
    return traj, jax.tree.map(np.asarray, cache)


@pytest.mark.slow
def test_staged_model_step_matches_plain_across_flushes():
    """~90 decode steps cross at least two flush boundaries; the staged
    trajectory must track the plain MXINT8 cache's logits (identical MXINT8
    write grid; only the f32 softmax reduction order differs)."""
    cfg, params, qcfgs, backend = _model(0)
    steps = 90
    t_plain, c_plain = _decode_trajectory(cfg, params, qcfgs, backend,
                                          "mxint8", steps)
    t_staged, c_staged = _decode_trajectory(cfg, params, qcfgs, backend,
                                            "mxint8-staged", steps)
    for i, (a, b) in enumerate(zip(t_plain, t_staged)):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4,
                                   err_msg=f"step {i}")
    # flushed region of the staged main cache is byte-identical to plain
    fl = int(c_staged["flushed"].min())
    assert fl >= 64, fl  # at least two flushes happened
    for k in ("k_codes", "k_exps", "v_codes", "v_exps"):
        np.testing.assert_array_equal(
            c_staged[k][..., :fl], c_plain[k][..., :fl], err_msg=k)


def test_staged_engine_tokens_match_plain():
    cfg, params, qcfgs, backend = _model(1)

    def run(cache_dtype, scan):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=MAX_LEN,
                           cache_dtype=cache_dtype, pallas_backend=backend,
                           scan_layers=scan)
        reqs = [Request(prompt_ids=[3, 9, 27, 4], max_new_tokens=8),
                Request(prompt_ids=[5, 6], max_new_tokens=6)]
        eng.run(reqs)
        return [r.output_ids for r in reqs]

    plain = run("mxint8", False)
    assert run("mxint8-staged", False) == plain
    assert run("mxint8-staged", True) == plain


def test_staged_eager_fallback_matches_kernel():
    """LQER_DISABLE_ATTN_KERNEL forces `_staged_eager_update`; logits must
    track the staged kernel path."""
    import os

    cfg, params, qcfgs, backend = _model(2)
    t_kernel, _ = _decode_trajectory(cfg, params, qcfgs, backend,
                                     "mxint8-staged", 12)
    os.environ["LQER_DISABLE_ATTN_KERNEL"] = "1"
    try:
        t_eager, _ = _decode_trajectory(cfg, params, qcfgs, backend,
                                        "mxint8-staged", 12)
    finally:
        del os.environ["LQER_DISABLE_ATTN_KERNEL"]
    for i, (a, b) in enumerate(zip(t_kernel, t_eager)):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4,
                                   err_msg=f"step {i}")


def test_staged_partial_admission_scatter():
    """Admitting into slot 1 of a 3-slot engine exercises the per-slot
    scatter path with the 1-D `flushed` key."""
    cfg, params, qcfgs, backend = _model(3)
    eng = DecodeEngine(params, cfg, qcfgs, num_slots=3, max_len=MAX_LEN,
                       cache_dtype="mxint8-staged", pallas_backend=backend)
    reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=4),
            Request(prompt_ids=[5, 6], max_new_tokens=3),
            Request(prompt_ids=[8, 1, 2, 6], max_new_tokens=5),
            Request(prompt_ids=[7, 7], max_new_tokens=3)]
    eng.run(reqs)
    assert all(r.done for r in reqs)
    assert [len(r.output_ids) for r in reqs] == [4, 3, 5, 3]


def test_opt_staged_engine_matches_plain():
    """The OPT scan/unrolled bodies carry the same staged routing."""
    from lqer_tpu.models import OPTConfig

    cfg = OPTConfig.tiny(vocab_size=128, hidden=128, layers=2, heads=4,
                         ffn=128, max_pos=MAX_LEN)
    params = models.init_params(cfg, jax.random.PRNGKey(5))
    qcfg = {
        "linear": Q_CONFIG["linear"],
        "bmm": {"name": "flexible", "x_quantizer": _q(8, [1, 16], True),
                "w_quantizer": _q(8, [1, 16], True)},
    }
    qcfgs = models.quantize_model(cfg, qcfg, {"linear": {"rank": 16}})
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(cache_dtype, scan):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=MAX_LEN,
                           cache_dtype=cache_dtype, scan_layers=scan)
        reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=6),
                Request(prompt_ids=[5, 6], max_new_tokens=4)]
        eng.run(reqs)
        return [r.output_ids for r in reqs]

    plain = run("mxint8", False)
    assert run("mxint8-staged", False) == plain
    assert run("mxint8-staged", True) == plain


def test_staged_heterogeneous_configs_match_unrolled():
    """model_layer_{i} overrides split the scan into config segments; the
    staged cache must thread through segment boundaries identically to the
    unrolled engine."""
    cfg = LlamaConfig.tiny(vocab_size=128, hidden=256, layers=3, heads=4,
                           kv_heads=2, inter=256, max_pos=MAX_LEN)
    lin6 = {**Q_CONFIG["linear"],
            "x_quantizer": _q(6, [1, 16], True)}
    q_het = dict(Q_CONFIG)
    q_het["model_layer_1"] = {
        "self_attn": {
            "q_proj": lin6, "k_proj": Q_CONFIG["linear"],
            "v_proj": Q_CONFIG["linear"], "o_proj": Q_CONFIG["linear"],
            "matmul_0": Q_CONFIG["matmul"], "matmul_1": Q_CONFIG["matmul"],
        },
        "mlp": {p: Q_CONFIG["linear"]
                for p in ("gate_proj", "up_proj", "down_proj")},
    }
    params = models.init_params(cfg, jax.random.PRNGKey(9))
    qcfgs = models.quantize_model(cfg, q_het, {"linear": {"rank": 16}})
    params = models.prepare_ptq(params, cfg, qcfgs)

    def run(scan):
        eng = DecodeEngine(params, cfg, qcfgs, num_slots=2, max_len=MAX_LEN,
                           cache_dtype="mxint8-staged", scan_layers=scan)
        reqs = [Request(prompt_ids=[3, 9, 27], max_new_tokens=5),
                Request(prompt_ids=[5, 6], max_new_tokens=4)]
        eng.run(reqs)
        return [r.output_ids for r in reqs]

    assert run(True) == run(False)
