"""Production experiment templates: parse, invariants, and tiny smoke runs.

The 20 templates under `experiments/configs/template/` are translated from
the reference's recipe surface (`/root/reference/experiments/configs/template/`,
see `_translate.py` for the deliberate deltas). These tests pin:

* every template parses and keeps the documented config invariants
  (`llama-7b.toml:91`: eval w_quantizer ≡ approximator W_quantizer;
  `llama-7b.toml:74-76`: l_config rank ≡ approximator rank — normalized by
  the translator);
* every model_name resolves to an arch config;
* the approximator regexes match the actual weight names of our models;
* a tiny-model override of one template per arch family (incl. the -int
  variants) completes the profile→approximate→perplexity pipeline.
"""

import copy
from pathlib import Path

import pytest

from lqer_tpu import models
from lqer_tpu.runners import run_pipeline
from lqer_tpu.utils.config import (
    find_matched_pattern,
    load_config,
    save_config,
)

TEMPLATE_DIR = Path(__file__).resolve().parents[1] / "experiments/configs/template"
TEMPLATES = sorted(p for p in TEMPLATE_DIR.glob("*.toml"))


def test_template_inventory():
    names = {p.stem for p in TEMPLATES}
    expected = {
        "llama-1.1b", "llama-7b", "llama-13b", "llama-30b", "llama-65b",
        "llama-2-7b", "llama-2-13b", "llama-2-70b", "llama-7b-int",
        "vicuna-7b-v1.5", "vicuna-13b-v1.5", "mistral-7b",
        "opt-125m", "opt-350m", "opt-1.3b", "opt-2.7b", "opt-6.7b",
        "opt-13b", "opt-30b", "opt-6.7b-int",
    }
    assert expected <= names, expected - names


@pytest.mark.parametrize("path", TEMPLATES, ids=lambda p: p.stem)
def test_template_parses_and_invariants(path):
    cfg = load_config(path)
    default = cfg["approximate"]["approximator"]["default"]
    # eval w_quantizer must equal approximation W_quantizer (llama-7b.toml:91)
    assert cfg["q_config"]["linear"]["w_quantizer"] == default["W_quantizer"]
    # l_config rank must equal approximator rank (llama-7b.toml:74-76)
    assert cfg["l_config"]["linear"]["rank"] == default["rank"]
    # model resolves to an arch config
    mcfg = models.get_model_config(cfg["model_name"])
    # regexes match this arch's actual quantized-linear weight names
    patterns = [p for p in cfg["approximate"]["approximator"] if p != "default"]
    prefixes = models.quantizable_module_prefixes(mcfg, 0)
    for prefix, _ in prefixes:
        assert find_matched_pattern(prefix + ".weight", patterns), (
            path.stem, prefix)
    # all four stages are enabled in a production template
    for flag in ("enable_profiling", "enable_approximation",
                 "enable_perplexity_evaluation",
                 "enable_harness_downstream_evaluation"):
        assert cfg[flag] is True
    # no reference-ism survived the translation
    text = path.read_text()
    assert "device_map" not in text
    assert ".pt\"" not in text


def _tinify(cfg: dict, arch: str, tmp_path: Path) -> dict:
    cfg = copy.deepcopy(cfg)
    if arch == "opt":
        cfg["model"] = {
            "arch": "opt", "vocab_size": 256, "hidden_size": 64,
            "ffn_dim": 128, "num_hidden_layers": 2, "num_attention_heads": 4,
            "max_position_embeddings": 64,
        }
    else:
        cfg["model"] = {
            "arch": arch, "vocab_size": 256, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "max_position_embeddings": 64,
        }
    cfg["checkpoint_path"] = str(tmp_path / "ckpt")
    cfg["overwrite_checkpoint"] = True
    cfg["enable_harness_downstream_evaluation"] = False  # offline
    synth = {"vocab_size": 256, "num_train": 4, "num_test": 4}
    cfg["profile"].update(
        dataset="synthetic", max_length=32, batch_size=2, num_samples=4,
        num_raw_samples=8, synthetic=synth, dtype="float32",
    )
    cfg["evaluate"]["dtype"] = "float32"
    cfg["evaluate"]["perplexity"].update(
        dataset="synthetic", batch_size=2, max_length=32, synthetic=synth,
    )
    cfg["approximate"]["approximator"]["default"]["rank"] = 8
    cfg["l_config"]["linear"]["rank"] = 8
    cfg["approximate"]["keep_error_T"] = False
    return cfg


SMOKE = {
    "opt-125m": "opt",
    "opt-6.7b-int": "opt",
    "llama-7b": "llama",
    "llama-7b-int": "llama",
    "mistral-7b": "mistral",
}


def test_sweep_override_sets():
    """`lqer-tpu sweep` reproduces the reference sweep scripts' override
    matrices (`sweep_lqer_act.sh:41-74`, `sweep_lqer_act_int.sh:52-66`)."""
    from lqer_tpu.sweep import build_overrides

    act = build_overrides("lqer-act", 32, 4, 8, "[1,16]", "[1,16]", "d", 32)
    assert "--l_config:linear:rank=32" in act
    assert "--q_config:linear:w_quantizer:width=4" in act
    assert "--q_config:matmul:x_quantizer:block_size=:ast:[1,16]" in act

    intv = build_overrides("lqer-act-int", 32, 4, 8, "[1,-1]", "[1,16]",
                           "d", 64)
    assert "--approximate:name=lqer-act" in intv
    assert "--q_config:linear:w_quantizer:block_size=:ast:[1,-1]" in intv
    assert "--q_config:linear:x_quantizer:name=passthrough" in intv
    assert "--q_config:bmm:w_quantizer:name=passthrough" in intv
    assert "--approximate:approximator:default:A_quantizer:name=passthrough" in intv
    # no stale block/width overrides survive for the passthrough operands
    assert not any("x_quantizer:width" in o for o in intv)
    assert not any("A_quantizer:width" in o for o in intv)

    base = build_overrides("no-lqer", 1, 4, 8, "[1,16]", "[1,16]", "d", 32)
    assert "--evaluate:disable_lqer=:ast:True" in base
    assert "--approximate:name=lqer-svd" in base


@pytest.mark.parametrize("stem", sorted(SMOKE), ids=str)
def test_template_smoke_pipeline(stem, tmp_path):
    """Tiny-model override of each arch family (and the -int variants)
    completes profile → approximate → evaluate-perplexity."""
    cfg = _tinify(load_config(TEMPLATE_DIR / f"{stem}.toml"), SMOKE[stem],
                  tmp_path)
    cfg_path = tmp_path / f"{stem}.toml"
    save_config(cfg, cfg_path)
    out = run_pipeline([str(cfg_path)])
    assert out["enable_perplexity_evaluation"] is False  # stage ran
    ckpt = tmp_path / "ckpt"
    assert (ckpt / "approximate").exists()
    ppl_files = list((ckpt / "evaluate_perplexity").glob("*.json"))
    assert ppl_files, list(ckpt.rglob("*"))


BASELINE_DIR = TEMPLATE_DIR.parent / "baseline"


def test_baseline_configs_inventory():
    """12 baseline-eval configs mirroring the reference's
    `experiments/configs/baseline/` rows (VERDICT r3 item 7)."""
    stems = sorted(p.stem for p in BASELINE_DIR.glob("*.toml"))
    assert len(stems) == 12, stems
    for ref in ("opt-6.7b", "opt-13b_autogptq", "llama-7b", "llama-30b",
                "mistral-7b", "llama-1.1b"):
        assert ref in stems, stems


@pytest.mark.parametrize(
    "path", sorted(BASELINE_DIR.glob("*.toml")), ids=lambda p: p.stem)
def test_baseline_config_resolves(path):
    """Each baseline config parses, resolves to a known model config, and
    names a method `experiments/baselines.py` accepts as its default."""
    import sys

    sys.path.insert(0, str(TEMPLATE_DIR.parents[2]))
    from experiments.baselines import (
        INT_METHODS,
        METHOD_DTYPES,
        QUANT_METHODS,
    )
    from lqer_tpu.runners import build_model_config

    cfg = load_config(path)
    arch_cfg = build_model_config(cfg)
    assert arch_cfg.num_hidden_layers > 0
    method = cfg["evaluate"]["hf_quant_method"]
    assert method in (list(METHOD_DTYPES) + list(QUANT_METHODS)
                      + list(INT_METHODS)), method
    ppl = cfg["evaluate"]["perplexity"]
    assert ppl["dataset"] == "wikitext2" and ppl["max_length"] == 2048
    assert cfg["evaluate"]["harness_downstream"]["datasets"]
