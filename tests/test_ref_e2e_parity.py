"""End-to-end numeric cross-validation against the reference implementation.

Runs the reference's ACTUAL torch code in place (see `ref_pipeline_oracle`)
on a tiny random-init HF ``OPTForCausalLM`` — no network, no checkpoints —
and asserts the lqer-tpu pipeline reproduces every composed stage on the
identical weights and data:

1. scale-dict parity: `register_scale_hooks` (`statistic_profiler/scale.py:54-69`)
   vs our tap-based profiler.
2. approximator parity: `ModelApproximatorLqerAct.compute`
   (`approximate/lqer_act.py:161-208`) vs our vmap-batched approximator —
   A·B products and the l1 quality metric (A/B individually are only defined
   up to per-singular-vector sign).
3. quantized-layer parity: `LinearFlexibleLqer.forward`
   (`quantize/quantized_layers/linear.py:145-166`) vs our `qlinear`.
4. full-model parity: `quantize_opt_model` (`models/opt_decoder.py:383-409`)
   + reference perplexity loop (`evaluate/evaluate_lm.py:11-87`) vs our
   quantized forward + `evaluate_perplexity` — logits with shared A/B, and
   pipeline-vs-pipeline perplexity with each side's own A/B.

This is the measurement behind BASELINE.md's quality-parity acceptance: the
quantizers were already bit-exact (test_quantizers.py); this file proves the
composition is too.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_pipeline_oracle import (
    load_reference_llama_decoder,
    load_reference_mistral_decoder,
    load_reference_opt_decoder,
    load_reference_pipeline,
)

REF = load_reference_pipeline()

pytestmark = pytest.mark.skipif(
    REF is None, reason="reference pipeline not loadable (mount/torch/pandas)"
)

import jax
import jax.numpy as jnp

from lqer_tpu import models
from lqer_tpu.approximate import ModelApproximator
from lqer_tpu.evaluate.perplexity import evaluate_perplexity
from lqer_tpu.models import OPTConfig
from lqer_tpu.ops.qlinear import QLinearConfig, prepare_qlinear_params, qlinear
from lqer_tpu.profiler.scale import ScaleAccumulator, batch_mean_abs_tap

SEED = 1234
RANK = 16
VOCAB, HIDDEN, LAYERS, HEADS, FFN, MAX_POS = 256, 64, 2, 4, 128, 64


def _bfp(width, block, skip):
    return {
        "name": "block_fp", "width": width, "exponent_width": 8,
        "exponent_bias": None, "block_size": block, "skip_first_dim": skip,
    }


Q_CONFIG = {
    "linear": {
        "name": "flexible_lqer", "is_ptq": True, "default": False,
        "x_quantizer": _bfp(8, [1, 16], True),
        "w_quantizer": _bfp(4, [1, 16], False),
        "b_quantizer": _bfp(8, [1, 16], False),
    },
    "bmm": {
        "name": "flexible", "default": False,
        "x_quantizer": _bfp(8, [1, 16], True),
        "w_quantizer": _bfp(8, [1, 16], True),
    },
}
L_CONFIG = {"linear": {"rank": RANK}}
APPROX_CONFIG = {
    "name": "lqer-act",
    "device": "cpu",
    "approximator": {
        r"model\.decoder\.layers\.[0-9]+\.self_attn\.(k|q|v|out)_proj\.weight": "default",
        r"model\.decoder\.layers\.[0-9]+\.(fc1|fc2)\.weight": "default",
        "default": {
            "rank": RANK,
            "W_quantizer": _bfp(4, [1, 16], False),
            "A_quantizer": _bfp(8, [16, 1], False),
            "B_quantizer": _bfp(8, [16, 1], False),
        },
    },
}


@pytest.fixture(scope="module")
def tiny_opt():
    """(torch OPTForCausalLM, our cfg, our flat params) with shared weights."""
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM

    torch.manual_seed(SEED)
    hf_cfg = HFOPTConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, ffn_dim=FFN,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        max_position_embeddings=MAX_POS, word_embed_proj_dim=HIDDEN,
        dropout=0.0, attention_dropout=0.0, layerdrop=0.0,
        activation_function="relu", attn_implementation="eager",
    )
    tmodel = OPTForCausalLM(hf_cfg).eval()
    cfg = OPTConfig.tiny(vocab_size=VOCAB, hidden=HIDDEN, layers=LAYERS,
                         heads=HEADS, ffn=FFN, max_pos=MAX_POS)
    params = {
        k: jnp.asarray(v.detach().float().numpy())
        for k, v in tmodel.state_dict().items()
    }
    return tmodel, cfg, params


def _calib_batches(n_batches=3, batch=2, seq=24):
    rng = np.random.RandomState(SEED + 1)
    return [rng.randint(0, VOCAB, size=(batch, seq)).astype(np.int64)
            for _ in range(n_batches)]


def _ref_scale_dict(tmodel):
    factory = REF.statistic_profiler.register_scale_hooks(tmodel, "mean(abs())")
    with torch.no_grad():
        for ids in _calib_batches():
            tmodel(input_ids=torch.from_numpy(ids))
    return {k: v.numpy() for k, v in factory.get_scale_dict().items()}


def _our_scale_dict(cfg, params):
    acc = ScaleAccumulator()
    for ids in _calib_batches():
        stats = {}
        models.forward(params, jnp.asarray(ids), cfg, None,
                       tap=batch_mean_abs_tap(stats))
        acc.update(stats)
    return {k: np.asarray(v) for k, v in acc.finalize().items()}


@pytest.fixture(scope="module")
def scale_dicts(tiny_opt):
    import copy

    tmodel, cfg, params = tiny_opt
    # hooks mutate nothing, but register on a copy to keep tmodel pristine
    ref = _ref_scale_dict(copy.deepcopy(tmodel))
    ours = _our_scale_dict(cfg, params)
    return ref, ours


def test_scale_profiler_parity(scale_dicts):
    ref, ours = scale_dicts
    decoder_keys = [k for k in ref if ".layers." in k]
    assert decoder_keys, list(ref)
    for k in decoder_keys:
        assert k in ours, (k, sorted(ours))
        np.testing.assert_allclose(ours[k], ref[k], rtol=2e-5, atol=1e-7,
                                   err_msg=k)
    # the head is hooked too (every nn.Linear)
    np.testing.assert_allclose(ours["lm_head.scale"], ref["lm_head.scale"],
                               rtol=2e-5, atol=1e-7)


@pytest.fixture(scope="module")
def approximations(tiny_opt, scale_dicts):
    import copy

    tmodel, cfg, params = tiny_opt
    ref_scales, _ = scale_dicts

    ApproxCls = REF.approximate.get_model_approximator_cls("lqer-act")
    state_dict = {k: v.detach().float().clone()
                  for k, v in tmodel.state_dict().items()}
    ref_approx = ApproxCls(state_dict, copy.deepcopy(APPROX_CONFIG))
    ref_approx.load_scale_dict(
        {k: torch.from_numpy(v) for k, v in ref_scales.items()})
    ref_out = ref_approx.compute(delete_after_compute=True)

    ours = ModelApproximator(params, copy.deepcopy(APPROX_CONFIG))
    ours.load_scale_dict(ref_scales)  # identical input scales on both sides
    our_out = ours.compute(keep_error_T=False)
    return ref_out, our_out


def test_approximator_parity(approximations):
    ref_out, our_out = approximations
    ref_lr = {k: v.detach().numpy() for k, v in ref_out["low_rank_dict"].items()}
    our_lr = {k: np.asarray(v) for k, v in our_out["low_rank_dict"].items()}
    assert set(ref_lr) == set(our_lr)
    modules = sorted({k[:-2] for k in ref_lr if k.endswith(".A")})
    assert len(modules) == 6 * LAYERS
    for m in modules:
        ab_ref = ref_lr[m + ".A"] @ ref_lr[m + ".B"]
        ab_our = our_lr[m + ".A"] @ our_lr[m + ".B"]
        # SVD factors agree up to per-vector sign; products must agree up to
        # one quantization step of the 8-bit A/B grids around ties
        np.testing.assert_allclose(ab_our, ab_ref, atol=5e-4, rtol=0,
                                   err_msg=m)
    ref_metrics = {r["name"]: r["l1_norm(AB-Q_error_T)/n"]
                   for _, r in ref_out["df"].iterrows()}
    our_metrics = {r["name"]: r["l1_norm(AB-Q_error_T)/n"]
                   for r in our_out["df"]}
    for name, ref_m in ref_metrics.items():
        assert abs(our_metrics[name] - ref_m) < 5e-6, (name, ref_m,
                                                       our_metrics[name])


def test_quantized_linear_parity():
    """`LinearFlexibleLqer.forward` (`linear.py:145-166`) vs our `qlinear`
    on identical weights/bias/A/B/x."""
    get_cls = REF.quantize.get_quantized_layer_cls
    lin_cls = get_cls("linear", Q_CONFIG["linear"])
    torch.manual_seed(SEED + 2)
    lin = lin_cls(64, 32, bias=True, q_config=Q_CONFIG["linear"],
                  l_config={"rank": RANK})
    w = torch.randn(32, 64)
    b = torch.randn(32) * 0.1
    a = torch.randn(64, RANK) * 0.02
    bb = torch.randn(RANK, 32) * 0.02
    with torch.no_grad():
        lin.weight.copy_(w)
        lin.bias.copy_(b)
        lin.A.copy_(a)
        lin.B.copy_(bb)
    x = torch.randn(3, 8, 64)
    with torch.no_grad():
        ref_y = lin(x).numpy()  # fires the is_ptq latch

    qc = QLinearConfig.from_q_config(Q_CONFIG["linear"], L_CONFIG["linear"])
    p = {"weight": jnp.asarray(w.numpy()), "bias": jnp.asarray(b.numpy()),
         "A": jnp.asarray(a.numpy()), "B": jnp.asarray(bb.numpy())}
    p = prepare_qlinear_params(p, qc)
    our_y = np.asarray(qlinear(jnp.asarray(x.numpy()), p, qc))
    np.testing.assert_allclose(our_y, ref_y, rtol=1e-5, atol=1e-6)


class _LayerAdapter(torch.nn.Module):
    """transformers-4.57 decoder loop → reference 4.37 layer signature."""

    def __init__(self, layer):
        super().__init__()
        self.layer = layer

    def forward(self, hidden_states, attention_mask=None, position_ids=None,
                layer_head_mask=None, past_key_values=None,
                output_attentions=False, use_cache=False, cache_position=None,
                **kwargs):
        return self.layer(
            hidden_states, attention_mask=attention_mask,
            layer_head_mask=layer_head_mask, past_key_value=None,
            output_attentions=False, use_cache=False,
        )


@pytest.fixture(scope="module")
def ref_quantized_model(tiny_opt, approximations):
    import copy

    od = load_reference_opt_decoder()
    if od is None:
        pytest.skip("reference opt_decoder not loadable under installed "
                    "transformers")
    tmodel, _, _ = tiny_opt
    ref_out, _ = approximations
    qmodel = od.quantize_opt_model(copy.deepcopy(tmodel),
                                   q_config=copy.deepcopy(Q_CONFIG),
                                   l_config=copy.deepcopy(L_CONFIG))
    missing, unexpected = qmodel.load_state_dict(
        {k: v.detach().clone() for k, v in ref_out["low_rank_dict"].items()},
        strict=False,
    )
    assert not unexpected, unexpected
    for i, layer in enumerate(qmodel.model.decoder.layers):
        qmodel.model.decoder.layers[i] = _LayerAdapter(layer)
    return qmodel.eval()


def _eval_batches(n_batches=4, batch=2, seq=32):
    rng = np.random.RandomState(SEED + 3)
    return [rng.randint(0, VOCAB, size=(batch, seq)).astype(np.int64)
            for _ in range(n_batches)]


def test_full_model_logits_parity(tiny_opt, approximations, ref_quantized_model):
    """Same weights, same A/B (the reference's), same tokens: logits of the
    reference's composed quantized model vs our quantized forward."""
    _, cfg, params = tiny_opt
    ref_out, _ = approximations
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    our_params = models.load_low_rank_dict(
        dict(params),
        {k: v.detach().numpy() for k, v in ref_out["low_rank_dict"].items()},
    )
    our_params = models.prepare_ptq(our_params, cfg, qcfgs)

    ids = _eval_batches(n_batches=1)[0]
    with torch.no_grad():
        ref_logits = ref_quantized_model(
            input_ids=torch.from_numpy(ids)).logits.numpy()
    our_logits = np.asarray(
        models.forward(our_params, jnp.asarray(ids), cfg, qcfgs))
    np.testing.assert_allclose(our_logits, ref_logits, rtol=1e-4, atol=5e-4)
    np.testing.assert_array_equal(np.argmax(our_logits, -1),
                                  np.argmax(ref_logits, -1))


# ---------------------------------------------------------------------------
# Llama family (the flagship serving arch): reference fork + host HF model
# ---------------------------------------------------------------------------
LLAMA_Q_CONFIG = dict(Q_CONFIG)
LLAMA_Q_CONFIG["matmul"] = Q_CONFIG["bmm"]
LLAMA_APPROX = {
    "name": "lqer-act",
    "device": "cpu",
    "approximator": {
        r"model\.layers\.[0-9]+\.self_attn\.(k|q|v|o)_proj\.weight": "default",
        r"model\.layers\.[0-9]+\.mlp\.(gate|down|up)_proj\.weight": "default",
        "default": APPROX_CONFIG["approximator"]["default"],
    },
}


@pytest.fixture(scope="module")
def tiny_llama():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    from lqer_tpu.models import LlamaConfig

    torch.manual_seed(SEED + 7)
    hf_cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=FFN,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=HEADS // 2, max_position_embeddings=MAX_POS,
        rms_norm_eps=1e-6, attention_bias=False, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    tmodel = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig.tiny(vocab_size=VOCAB, hidden=HIDDEN, layers=LAYERS,
                           heads=HEADS, kv_heads=HEADS // 2, inter=FFN,
                           max_pos=MAX_POS)
    params = {
        k: jnp.asarray(v.detach().float().numpy())
        for k, v in tmodel.state_dict().items()
    }
    return tmodel, cfg, params


class _LlamaLayerAdapter(torch.nn.Module):
    """transformers-4.57 Llama decoder loop → reference 4.37 fork layer."""

    def __init__(self, layer):
        super().__init__()
        self.layer = layer

    def forward(self, hidden_states, attention_mask=None, position_ids=None,
                past_key_values=None, output_attentions=False,
                use_cache=False, cache_position=None,
                position_embeddings=None, **kwargs):
        if position_ids is None:
            b, s = hidden_states.shape[:2]
            position_ids = torch.arange(s).unsqueeze(0).expand(b, s)
        out = self.layer(
            hidden_states, attention_mask=attention_mask,
            position_ids=position_ids, past_key_value=None,
            output_attentions=False, use_cache=False,
        )
        # 4.57's decoder loop consumes the tensor directly (4.37 returned
        # a tuple)
        return out[0]


def test_llama_full_pipeline_parity(tiny_llama):
    """Llama: reference scale hooks → ModelApproximatorLqerAct →
    quantize_llama_model (GQA, quantized matmul_0/1, rotary) vs our pipeline
    on the identical weights/tokens — logits with shared A/B + own-pipeline
    perplexity."""
    import copy

    od = load_reference_llama_decoder()
    if od is None:
        pytest.skip("reference llama_decoder not loadable")
    tmodel, cfg, params = tiny_llama

    # --- reference pipeline ---
    ref_scales = _ref_scale_dict(copy.deepcopy(tmodel))
    ApproxCls = REF.approximate.get_model_approximator_cls("lqer-act")
    state_dict = {k: v.detach().float().clone()
                  for k, v in tmodel.state_dict().items()}
    ref_approx = ApproxCls(state_dict, copy.deepcopy(LLAMA_APPROX))
    ref_approx.load_scale_dict(
        {k: torch.from_numpy(v) for k, v in ref_scales.items()})
    ref_out = ref_approx.compute(delete_after_compute=True)
    assert len(ref_out["low_rank_dict"]) == 2 * 7 * LAYERS

    qmodel = od.quantize_llama_model(copy.deepcopy(tmodel),
                                     q_config=copy.deepcopy(LLAMA_Q_CONFIG),
                                     l_config=copy.deepcopy(L_CONFIG))
    missing, unexpected = qmodel.load_state_dict(
        {k: v.detach().clone() for k, v in ref_out["low_rank_dict"].items()},
        strict=False,
    )
    assert not unexpected, unexpected
    for i, layer in enumerate(qmodel.model.layers):
        qmodel.model.layers[i] = _LlamaLayerAdapter(layer)
    qmodel = qmodel.eval()

    # --- ours: same weights, reference's A/B -> logit parity ---
    qcfgs = models.quantize_model(cfg, LLAMA_Q_CONFIG, L_CONFIG)
    our_params = models.load_low_rank_dict(
        dict(params),
        {k: v.detach().numpy() for k, v in ref_out["low_rank_dict"].items()},
    )
    our_params = models.prepare_ptq(our_params, cfg, qcfgs)

    ids = _eval_batches(n_batches=1)[0]
    with torch.no_grad():
        ref_logits = qmodel(input_ids=torch.from_numpy(ids)).logits.numpy()
    our_logits = np.asarray(
        models.forward(our_params, jnp.asarray(ids), cfg, qcfgs))
    np.testing.assert_allclose(our_logits, ref_logits, rtol=2e-4, atol=1e-3)
    np.testing.assert_array_equal(np.argmax(our_logits, -1),
                                  np.argmax(ref_logits, -1))

    # --- own-pipeline perplexity parity ---
    from torch.utils.data import DataLoader

    rows = np.concatenate(_eval_batches())
    data = [{"input_ids": torch.from_numpy(r), "labels": torch.from_numpy(r)}
            for r in rows]
    ref_ppl = REF.evaluate.evaluate_perplexity(
        qmodel, DataLoader(data, batch_size=2, shuffle=False))["perplexity"]

    our_scales = _our_scale_dict(cfg, params)
    ours = ModelApproximator(params, copy.deepcopy(LLAMA_APPROX))
    ours.load_scale_dict(our_scales)
    our_lr = ours.compute(keep_error_T=False)["low_rank_dict"]
    p2 = models.prepare_ptq(models.load_low_rank_dict(dict(params), our_lr),
                            cfg, qcfgs)
    fwd = jax.jit(lambda t: models.forward(p2, t, cfg, qcfgs))
    our_ppl = evaluate_perplexity(fwd, rows, batch_size=2)["perplexity"]
    assert abs(our_ppl - ref_ppl) / ref_ppl < 1e-3, (our_ppl, ref_ppl)


def test_mistral_quantized_model_logits_parity():
    """Mistral: the reference fork's quantized model (GQA + its own
    matmul_0/1 quantized attention) vs our mistral-arch forward on identical
    weights and reference-computed A/B. Sliding window inactive at this
    sequence length (matching the reference's 2048 < 4096 regime)."""
    import copy

    od = load_reference_mistral_decoder()
    if od is None:
        pytest.skip("reference mistral_decoder not loadable")
    from transformers import MistralConfig as HFMistralConfig
    from transformers import MistralForCausalLM

    from lqer_tpu.models import LlamaConfig

    torch.manual_seed(SEED + 11)
    hf_cfg = HFMistralConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=FFN,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=HEADS // 2, max_position_embeddings=MAX_POS,
        rms_norm_eps=1e-6, sliding_window=4096, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    tmodel = MistralForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig.tiny(vocab_size=VOCAB, hidden=HIDDEN, layers=LAYERS,
                           heads=HEADS, kv_heads=HEADS // 2, inter=FFN,
                           max_pos=MAX_POS, arch="mistral",
                           sliding_window=4096)
    params = {k: jnp.asarray(v.detach().float().numpy())
              for k, v in tmodel.state_dict().items()}

    ref_scales = _ref_scale_dict(copy.deepcopy(tmodel))
    ApproxCls = REF.approximate.get_model_approximator_cls("lqer-act")
    ref_approx = ApproxCls(
        {k: v.detach().float().clone() for k, v in tmodel.state_dict().items()},
        copy.deepcopy(LLAMA_APPROX),  # same weight-name regexes
    )
    ref_approx.load_scale_dict(
        {k: torch.from_numpy(v) for k, v in ref_scales.items()})
    ref_out = ref_approx.compute(delete_after_compute=True)

    qmodel = od.quantize_mistral_model(copy.deepcopy(tmodel),
                                       q_config=copy.deepcopy(LLAMA_Q_CONFIG),
                                       l_config=copy.deepcopy(L_CONFIG))
    missing, unexpected = qmodel.load_state_dict(
        {k: v.detach().clone() for k, v in ref_out["low_rank_dict"].items()},
        strict=False,
    )
    assert not unexpected, unexpected
    for i, layer in enumerate(qmodel.model.layers):
        qmodel.model.layers[i] = _LlamaLayerAdapter(layer)
    qmodel = qmodel.eval()

    qcfgs = models.quantize_model(cfg, LLAMA_Q_CONFIG, L_CONFIG)
    our_params = models.load_low_rank_dict(
        dict(params),
        {k: v.detach().numpy() for k, v in ref_out["low_rank_dict"].items()},
    )
    our_params = models.prepare_ptq(our_params, cfg, qcfgs)

    ids = _eval_batches(n_batches=1)[0]
    with torch.no_grad():
        ref_logits = qmodel(input_ids=torch.from_numpy(ids)).logits.numpy()
    our_logits = np.asarray(
        models.forward(our_params, jnp.asarray(ids), cfg, qcfgs))
    np.testing.assert_allclose(our_logits, ref_logits, rtol=2e-4, atol=1e-3)
    np.testing.assert_array_equal(np.argmax(our_logits, -1),
                                  np.argmax(ref_logits, -1))


def test_full_pipeline_perplexity_parity(tiny_opt, scale_dicts, approximations,
                                         ref_quantized_model):
    """Each side's OWN pipeline end to end — reference scale hooks → ref
    approximator → ref quantized model → ref ppl loop, vs our profiler → our
    approximator → our quantized forward → our ppl — on identical weights
    and tokens. This is the BASELINE.md acceptance measurement in miniature."""
    from torch.utils.data import DataLoader

    _, cfg, params = tiny_opt
    _, our_scales = scale_dicts

    rows = np.concatenate(_eval_batches())  # (n, seq)

    # --- reference side (A/B were computed by the reference approximator) ---
    data = [{"input_ids": torch.from_numpy(r), "labels": torch.from_numpy(r)}
            for r in rows]
    loader = DataLoader(data, batch_size=2, shuffle=False)
    ref_results = REF.evaluate.evaluate_perplexity(ref_quantized_model, loader)

    # --- our side: our own scales -> our own A/B -> our quantized forward ---
    import copy

    approx = ModelApproximator(params, copy.deepcopy(APPROX_CONFIG))
    approx.load_scale_dict(our_scales)
    our_lr = approx.compute(keep_error_T=False)["low_rank_dict"]
    qcfgs = models.quantize_model(cfg, Q_CONFIG, L_CONFIG)
    our_params = models.load_low_rank_dict(dict(params), our_lr)
    our_params = models.prepare_ptq(our_params, cfg, qcfgs)

    fwd = jax.jit(lambda ids: models.forward(our_params, ids, cfg, qcfgs))
    our_results = evaluate_perplexity(fwd, rows, batch_size=2, progress=False)
    ref_ppl = ref_results["perplexity"]
    our_ppl = our_results["perplexity"]
    assert abs(our_ppl - ref_ppl) / ref_ppl < 1e-3, (our_ppl, ref_ppl)
