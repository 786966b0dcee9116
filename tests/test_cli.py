"""Console entry point (`lqer-tpu`) dispatch tests."""

import json

import pytest

from lqer_tpu.cli import main


def test_help_and_unknown(capsys):
    assert main([]) == 0
    assert "pipeline" in capsys.readouterr().out
    assert main(["bogus"]) == 2


def test_serve_dispatch(tmp_path, capsys):
    cfg = """
project = "test"
model_name = "test/opt-tiny"
checkpoint_path = "{}"

[model]
arch = "opt"
vocab_size = 128
hidden_size = 64
ffn_dim = 96
num_hidden_layers = 1
num_attention_heads = 4
max_position_embeddings = 128
""".format(tmp_path)
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(cfg)
    main(["serve", str(cfg_path), "--prompt", "1 2 3", "--fp",
          "--max-new-tokens", "2", "--slots", "1", "--max-len", "32"])
    out = capsys.readouterr().out
    assert "tokens:" in out


def test_collect_results_dispatch(tmp_path, capsys, monkeypatch):
    run_dir = tmp_path / "run1"
    run_dir.mkdir()
    (run_dir / "wikitext2.json").write_text(json.dumps(
        {"perplexity": 5.5, "loss": 1.7}))
    monkeypatch.chdir(tmp_path)
    main(["collect-results", str(tmp_path)])
    assert (tmp_path / "collected_perplexity.csv").exists()
