"""Config system tests (TOML + NA/None + nested overrides + regex matching,
reference `utils.py:58-182`)."""

import pytest

from lqer_tpu.utils import (
    convert_none_to_str_na,
    convert_str_na_to_none,
    find_matched_pattern,
    load_config,
    override_args,
    save_config,
)


def test_na_roundtrip():
    d = {"a": "NA", "b": {"c": ["NA", 1, "x"]}, "d": 2}
    out = convert_str_na_to_none(d)
    assert out["a"] is None
    assert out["b"]["c"][0] is None
    back = convert_none_to_str_na(out)
    assert back == d


def test_save_load_roundtrip(tmp_path):
    cfg = {
        "project": "p",
        "exponent_bias": None,
        "nested": {"block_size": [1, 16], "flag": True, "f": 1.5},
        "regex_keys": {r"model\.layers\.[0-9]+\.weight": "default"},
    }
    p = tmp_path / "c.toml"
    save_config(cfg, p)
    loaded = load_config(p)
    assert loaded["exponent_bias"] is None
    assert loaded["nested"]["block_size"] == [1, 16]
    assert loaded["nested"]["flag"] is True
    assert r"model\.layers\.[0-9]+\.weight" in loaded["regex_keys"]


def test_override_args_type_coercion():
    cfg = {"a": {"b": 4, "flag": False, "s": "x"}}
    cfg, over = override_args(cfg, ["--a:b=8", "--a:flag=true", "--a:s=y"])
    assert cfg["a"]["b"] == 8 and isinstance(cfg["a"]["b"], int)
    assert cfg["a"]["flag"] is True
    assert cfg["a"]["s"] == "y"
    assert over == {"a": {"b": 8, "flag": True, "s": "y"}}


def test_override_args_ast_literal():
    cfg = {"q": {"block_size": [16]}}
    cfg, _ = override_args(cfg, ["--q:block_size=:ast:[1, 32]"])
    assert cfg["q"]["block_size"] == [1, 32]


def test_find_matched_pattern():
    pats = [r"model\.layers\.[0-9]+\.fc1\.weight", r"other"]
    assert find_matched_pattern("model.layers.3.fc1.weight", pats) == pats[0]
    assert find_matched_pattern("model.layers.x.fc1.weight", pats) is None
    with pytest.raises(ValueError):
        find_matched_pattern("other", [r"other", r"oth.*"])
