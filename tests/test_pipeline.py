"""End-to-end pipeline tests on a tiny random-init OPT/Llama (offline).

Mirrors the reference's de-facto integration test (the debug config
`experiments/configs/debug/opt-125m.toml` running profile → approximate →
evaluate, SURVEY.md §4): on a tiny model we check the *ordering* oracle —
FP ppl <= LQER-corrected quantized ppl <= plain quantized ppl — and that a
full-rank correction recovers the FP weights almost exactly.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqer_tpu import models
from lqer_tpu.approximate import ModelApproximator, approximate_weight
from lqer_tpu.data import get_data_module
from lqer_tpu.evaluate import evaluate_perplexity
from lqer_tpu.models import OPTConfig, LlamaConfig
from lqer_tpu.ops import block_fp_quantizer, make_quantizer
from lqer_tpu.profiler import ScaleAccumulator, batch_mean_abs_tap


def _q(width, block, skip):
    return {
        "name": "block_fp",
        "width": width,
        "exponent_width": 8,
        "exponent_bias": None,
        "block_size": block,
        "skip_first_dim": skip,
    }


W_Q = _q(4, [1, 16], False)
X_Q = _q(8, [1, 16], True)
AB_Q = _q(8, [16, 1], False)

Q_CONFIG = {
    "linear": {
        "name": "flexible_lqer",
        "is_ptq": True,
        "x_quantizer": X_Q,
        "w_quantizer": W_Q,
        "b_quantizer": _q(8, [1, 16], False),
    },
    "matmul": {"name": "flexible", "x_quantizer": X_Q, "w_quantizer": X_Q},
    "bmm": {"name": "flexible", "x_quantizer": X_Q, "w_quantizer": X_Q},
}
L_CONFIG = {"linear": {"rank": 8}}


def approx_config(name, rank):
    return {
        "name": name,
        "approximator": {
            r"model\.decoder\.layers\.[0-9]+\.self_attn\.(k|q|v|out)_proj\.weight": "default",
            r"model\.decoder\.layers\.[0-9]+\.(fc1|fc2)\.weight": "default",
            r"model\.layers\.[0-9]+\.self_attn\.(k|q|v|o)_proj\.weight": "default",
            r"model\.layers\.[0-9]+\.mlp\.(gate|up|down)_proj\.weight": "default",
            "default": {
                "rank": rank,
                "W_quantizer": dict(W_Q),
                "A_quantizer": dict(AB_Q),
                "B_quantizer": dict(AB_Q),
            },
        },
    }


@pytest.fixture(scope="module")
def tiny_opt():
    cfg = OPTConfig.tiny(vocab_size=256, hidden=64, layers=2, heads=4, ffn=128)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    data = get_data_module("synthetic", max_length=32, vocab_size=256,
                           num_train=4, num_test=4)
    return cfg, params, data


def _ppl(cfg, params, data, layer_qcfgs):
    fwd = jax.jit(lambda ids: models.forward(params, ids, cfg, layer_qcfgs))
    return evaluate_perplexity(fwd, data["test"], batch_size=2)["perplexity"]


def _logits(cfg, params, data, layer_qcfgs):
    ids = jnp.asarray(data["test"][:2])
    return np.asarray(models.forward(params, ids, cfg, layer_qcfgs))


class TestApproximateWeight:
    def test_lowrank_reduces_error(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (64, 48)) * 0.05
        w_q = make_quantizer(W_Q)
        a_q = make_quantizer(AB_Q)
        b_q = make_quantizer(AB_Q)
        e_t = np.asarray((w - w_q(w)).T)
        err_plain = np.abs(e_t).sum() / e_t.size
        errs = []
        for rank in (4, 16, 48):
            a, b, target = approximate_weight(w, rank, w_q, a_q, b_q)
            ab = np.asarray(a) @ np.asarray(b)
            errs.append(np.abs(ab - e_t).sum() / e_t.size)
        # error decreases with rank and beats no correction
        assert errs[0] < err_plain
        assert errs[2] < errs[1] < errs[0]

    def test_act_scale_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(2), (32, 24)) * 0.05
        scale = jnp.exp(jax.random.normal(jax.random.PRNGKey(3), (24,)) * 0.5)
        w_q = make_quantizer(W_Q)
        ident = lambda x: x  # noqa: E731
        # full rank, no quantization of A/B -> correction recovers E^T exactly
        a, b, _ = approximate_weight(w, 24, w_q, ident, ident, scale=scale)
        e_t = np.asarray((w - w_q(w)).T)
        np.testing.assert_allclose(np.asarray(a @ b), e_t, atol=1e-4)


class TestPipelineOPT:
    def test_profile_approximate_evaluate(self, tiny_opt):
        cfg, params, data = tiny_opt

        # ---- stage 1: profile (runners.py:55-121) ----
        acc = ScaleAccumulator()

        @jax.jit
        def profiled(ids):
            stats = {}
            logits = models.forward(params, ids, cfg, None,
                                    tap=batch_mean_abs_tap(stats))
            return logits, stats

        for start in range(0, 4, 2):
            _, stats = profiled(jnp.asarray(data["train"][start:start + 2]))
            acc.update(stats)
        scale_dict = acc.finalize()
        assert "model.decoder.layers.0.self_attn.q_proj.scale" in scale_dict
        assert "lm_head.scale" in scale_dict
        s = scale_dict["model.decoder.layers.0.fc1.scale"]
        assert s.shape == (cfg.hidden_size,)
        assert bool(jnp.all(s >= 1e-12))

        # ---- stage 2: approximate (runners.py:124-192) ----
        approx = ModelApproximator(params, approx_config("lqer-act", 8))
        assert len(approx) == cfg.num_hidden_layers * 6
        approx.load_scale_dict(scale_dict)
        result = approx.compute()
        lrd = result["low_rank_dict"]
        assert "model.decoder.layers.0.self_attn.q_proj.A" in lrd
        assert lrd["model.decoder.layers.0.self_attn.q_proj.A"].shape == (
            cfg.hidden_size, 8,
        )
        for row in result["df"]:
            assert np.isfinite(row["l1_norm(AB-Q_error_T)/n"])

        # ---- stage 3: evaluate (runners.py:195-279) ----
        # On a tiny random-init model, ppl differences are noise; the sound
        # end-to-end oracle is LOGIT fidelity: the low-rank correction must
        # bring quantized logits measurably closer to the FP logits.
        logits_fp = _logits(cfg, params, data, None)

        qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
        qparams = models.prepare_ptq(params, cfg, qcfgs)

        # disable_lqer path: A/B absent -> plain W4A8
        logits_plain = _logits(cfg, qparams, data, qcfgs)
        err_plain = np.abs(logits_plain - logits_fp).mean()

        qparams_lqer = models.load_low_rank_dict(qparams, lrd)
        logits_lqer = _logits(cfg, qparams_lqer, data, qcfgs)
        err_lqer = np.abs(logits_lqer - logits_fp).mean()

        assert err_lqer < 0.9 * err_plain, (err_lqer, err_plain)

        # and the ppl path runs end-to-end with finite results
        ppl = _ppl(cfg, qparams_lqer, data, qcfgs)
        assert np.isfinite(ppl) and ppl > 1.0

    def test_lqer_svd_variant(self, tiny_opt):
        cfg, params, data = tiny_opt
        approx = ModelApproximator(params, approx_config("lqer-svd", 8))
        assert not approx.requires_scale_dict
        result = approx.compute(keep_error_T=False)
        assert result["error_T_dict"] == {}
        assert len(result["low_rank_dict"]) == 2 * cfg.num_hidden_layers * 6


class TestPipelineLlama:
    def test_quantized_forward_and_correction(self):
        cfg = LlamaConfig.tiny(vocab_size=256, hidden=64, layers=2, heads=4,
                               kv_heads=2, inter=96)
        params = models.init_params(cfg, jax.random.PRNGKey(5))
        data = get_data_module("synthetic", max_length=32, vocab_size=256,
                               num_train=4, num_test=4)

        logits_fp = _logits(cfg, params, data, None)
        qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
        qparams = models.prepare_ptq(params, cfg, qcfgs)
        logits_plain = _logits(cfg, qparams, data, qcfgs)
        err_plain = np.abs(logits_plain - logits_fp).mean()

        approx = ModelApproximator(params, approx_config("lqer-svd", 8))
        assert len(approx) == cfg.num_hidden_layers * 7
        lrd = approx.compute(keep_error_T=False)["low_rank_dict"]
        qparams_lqer = models.load_low_rank_dict(qparams, lrd)
        logits_lqer = _logits(cfg, qparams_lqer, data, qcfgs)
        err_lqer = np.abs(logits_lqer - logits_fp).mean()

        assert err_lqer < 0.9 * err_plain, (err_lqer, err_plain)
        assert np.isfinite(_ppl(cfg, qparams_lqer, data, qcfgs))

    def test_gqa_shapes(self):
        cfg = LlamaConfig.tiny(vocab_size=128, hidden=64, layers=1, heads=8,
                               kv_heads=2)
        params = models.init_params(cfg, jax.random.PRNGKey(6))
        ids = jnp.zeros((2, 16), dtype=jnp.int32)
        logits = models.forward(params, ids, cfg, None)
        assert logits.shape == (2, 16, 128)


class TestPTQLatch:
    def test_prepare_ptq_quantizes_weights_once(self, tiny_opt):
        cfg, params, _ = tiny_opt
        qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
        qparams = models.prepare_ptq(params, cfg, qcfgs)
        w_key = "model.decoder.layers.0.self_attn.q_proj.weight"
        expect = block_fp_quantizer(
            params[w_key], width=4, exponent_width=8, block_size=[1, 16],
            skip_first_dim=False,
        )
        np.testing.assert_allclose(
            np.asarray(qparams[w_key]), np.asarray(expect), atol=1e-7
        )
        # embeddings untouched
        emb = "model.decoder.embed_tokens.weight"
        np.testing.assert_array_equal(
            np.asarray(qparams[emb]), np.asarray(params[emb])
        )


class TestOPT350mShape:
    def test_project_in_out_forward_and_decode(self):
        from lqer_tpu.serving import make_cache, model_step

        cfg = OPTConfig(
            vocab_size=128, hidden_size=64, ffn_dim=96, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=64,
            do_layer_norm_before=False, word_embed_proj_dim=32,
        )
        params = models.init_params(cfg, jax.random.PRNGKey(9))
        assert "model.decoder.project_in.weight" in params
        ids = jnp.asarray([[1, 5, 9, 2]], dtype=jnp.int32)
        logits = models.forward(params, ids, cfg, None)
        assert logits.shape == (1, 4, 128)

        # cached decode parity with the full forward (post-LN + projections)
        cache = make_cache(cfg, 1, 32, dtype=jnp.float32)
        lg, cache = model_step(params, ids, cache,
                               jnp.zeros((1,), jnp.int32), cfg, None)
        np.testing.assert_allclose(
            np.asarray(lg[0, -1]), np.asarray(logits[0, -1]), atol=1e-5
        )
