"""End-to-end execution of the downstream-harness stage through the vendored
minieval (lm_eval-protocol parity): JaxCausalLM driven by real Instance
objects across every request type, producing the reference's stage-4
artifact shape (`/root/reference/src/lqer/runners.py:313-343`)."""

import json

import numpy as np
import pytest

from lqer_tpu.evaluate.harness import JaxCausalLM
from lqer_tpu.evaluate.minieval import (
    Instance,
    TASK_REGISTRY,
    make_table,
    simple_evaluate,
)
from tests.test_harness_adapter import FakeTok, _uniform_forward


def test_instance_protocol_matches_lm_eval():
    """Field-for-field parity with lm_eval v0.4's Instance dataclass."""
    inst = Instance(
        request_type="loglikelihood",
        doc={"q": 1},
        arguments=("ctx", " cont"),
        idx=2,
        metadata=("taskname", 7, 3),
    )
    # metadata unpacks in __post_init__
    assert inst.task_name == "taskname"
    assert inst.doc_id == 7
    assert inst.repeats == 3
    # args property tuple-wraps scalars
    assert inst.args == ("ctx", " cont")
    scalar = Instance("generate_until", {}, "just-a-string", 0)
    assert scalar.args == ("just-a-string",)
    # mutable response fields exist and start empty
    assert inst.resps == [] and inst.filtered_resps == {}


def test_simple_evaluate_all_tiny_tasks():
    lm = JaxCausalLM(_uniform_forward(), FakeTok(), max_length=64,
                     batch_size=4)
    tasks = sorted(TASK_REGISTRY)
    out = simple_evaluate(lm, tasks, num_fewshot=0)

    assert set(out) >= {"results", "versions", "n-shot", "configs"}
    assert set(out["results"]) == set(tasks)
    for task in tasks:
        metrics = out["results"][task]
        # 0.3-style bare keys and 0.4-style "metric,none" both present
        bare = [k for k in metrics
                if k != "alias" and "," not in k and not k.endswith("_stderr")]
        assert bare, task
        for k in bare:
            assert f"{k},none" in metrics
            assert f"{k}_stderr" in metrics
            assert np.isfinite(metrics[k])
    # multiple-choice metrics are accuracies in [0, 1]
    for t in ("tiny_arc_easy", "tiny_boolq", "tiny_piqa"):
        assert 0.0 <= out["results"][t]["acc"] <= 1.0
    # artifact is json-serializable like the runner's harness_results.json
    json.dumps(out)
    table = make_table(out)
    assert "tiny_arc_easy" in table and "acc" in table


def test_simple_evaluate_fewshot_changes_context():
    """num_fewshot>0 must lengthen the scored contexts (protocol check)."""
    captured = []

    class SpyLM(JaxCausalLM):
        def loglikelihood(self, requests):
            captured.extend(len(r.args[0]) for r in requests)
            return super().loglikelihood(requests)

    lm0 = SpyLM(_uniform_forward(), FakeTok(), max_length=128)
    simple_evaluate(lm0, ["tiny_boolq"], num_fewshot=0)
    len0 = max(captured)
    captured.clear()
    simple_evaluate(lm0, ["tiny_boolq"], num_fewshot=2)
    assert max(captured) > len0


def test_simple_evaluate_limit_and_unknown_task():
    lm = JaxCausalLM(_uniform_forward(), FakeTok(), max_length=64)
    out = simple_evaluate(lm, ["tiny_arc_easy"], limit=2)
    assert out["configs"]["tiny_arc_easy"]["num_docs"] == 8  # full fixture
    with pytest.raises(KeyError):
        simple_evaluate(lm, ["arc_easy"])  # real names need real lm_eval


def test_runner_stage_executes_minieval(tmp_path):
    """run_evaluate_harness_downstream end-to-end: tiny model, tiny tasks,
    writes harness_results.json with the reference's artifact shape."""
    import jax
    import jax.numpy as jnp
    from lqer_tpu import models, runners
    from lqer_tpu.models import OPTConfig

    cfg = OPTConfig.tiny(vocab_size=64, hidden=32, layers=1, heads=2, ffn=48)
    params = models.init_params(cfg, jax.random.PRNGKey(0))

    config = {
        "model_name": "tiny-opt",
        "evaluate": {
            "dtype": "float32",
            "harness_downstream": {
                "datasets": ["tiny_boolq", "tiny_gen", "arc_easy"],
                "num_fewshot": 0,
                "batch_size": 2,
                "max_length": 64,
            },
        },
    }

    # patch the model/tokenizer builders to the in-memory tiny model
    fwd = lambda ids: models.forward(params, ids, cfg, None)  # noqa: E731
    orig_build = runners._build_quantized_forward
    orig_tok = runners._get_tokenizer
    runners._build_quantized_forward = (
        lambda *a, **k: (cfg, params, None, fwd)
    )
    runners._get_tokenizer = lambda *a, **k: FakeTok()
    try:
        out_cfg = runners.run_evaluate_harness_downstream(config, tmp_path)
    finally:
        runners._build_quantized_forward = orig_build
        runners._get_tokenizer = orig_tok

    assert out_cfg is config
    result_file = tmp_path / "harness_results.json"
    assert result_file.exists()
    results = json.loads(result_file.read_text())
    # arc_easy (real benchmark) skipped offline; tiny tasks executed
    assert set(results["results"]) == {"tiny_boolq", "tiny_gen"}
    assert "acc" in results["results"]["tiny_boolq"]
    assert "exact_match" in results["results"]["tiny_gen"]
