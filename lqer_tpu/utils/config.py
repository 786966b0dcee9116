"""Config system: TOML files, "NA"⇌None convention, nested CLI overrides.

Schema-compatible with the reference so its sweep recipes translate directly
(`/root/reference/src/lqer/utils.py:21-264`):

* TOML cannot represent None — ``"NA"`` round-trips to ``None``
  (`utils.py:58-94`).
* CLI overrides of nested keys: ``--a:b:c=value`` with ``:ast:``-prefixed
  Python literals; plain values are coerced to the type of the existing
  entry (`utils.py:159-182`).
* Per-weight quantizer selection via regex fullmatch with ``"default"``
  string indirection (`utils.py:114-138`).
"""

from __future__ import annotations

import ast
import re
import tomllib
from copy import deepcopy
from pathlib import Path


def convert_str_na_to_none(d):
    if isinstance(d, dict):
        return {k: convert_str_na_to_none(v) for k, v in d.items()}
    if isinstance(d, list):
        return [convert_str_na_to_none(v) for v in d]
    if isinstance(d, tuple):
        return tuple(convert_str_na_to_none(v) for v in d)
    return None if d == "NA" else d


def convert_none_to_str_na(d):
    if isinstance(d, dict):
        return {k: convert_none_to_str_na(v) for k, v in d.items()}
    if isinstance(d, list):
        return [convert_none_to_str_na(v) for v in d]
    if isinstance(d, tuple):
        return tuple(convert_none_to_str_na(v) for v in d)
    return "NA" if d is None else d


def load_config(config_path) -> dict:
    with open(config_path, "rb") as f:
        config = tomllib.load(f)
    return convert_str_na_to_none(config)


def _toml_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    raise TypeError(f"Cannot serialize {type(v)} to TOML")


def _dump_toml(d: dict, prefix: str = "") -> str:
    """Minimal TOML writer (stdlib has no dumper; the external `toml` package
    is not a baked-in dependency). Emits scalar keys first, then sub-tables."""
    lines = []
    tables = []
    for k, v in d.items():
        if isinstance(v, dict):
            tables.append((k, v))
        else:
            key = k if re.fullmatch(r"[A-Za-z0-9_-]+", k) else _toml_value(k)
            lines.append(f"{key} = {_toml_value(v)}")
    out = "\n".join(lines)
    for k, v in tables:
        key = k if re.fullmatch(r"[A-Za-z0-9_-]+", k) else _toml_value(k)
        full = f"{prefix}.{key}" if prefix else key
        out += f"\n\n[{full}]\n" + _dump_toml(v, full)
    return out


def save_config(config: dict, config_path) -> None:
    config = convert_none_to_str_na(deepcopy(config))
    path = Path(config_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    text = _dump_toml(config).strip() + "\n"
    # round-trip sanity: what we wrote must parse back
    tomllib.loads(text)
    path.write_text(text)


def find_matched_pattern(query: str, patterns) -> str | None:
    """Regex-fullmatch `query` against `patterns`; unique match or None
    (`utils.py:114-126`)."""
    compiled = [re.compile(p) for p in patterns]
    matched = [p for p in compiled if p.fullmatch(query)]
    if len(matched) > 1:
        raise ValueError(f"Multiple patterns matched: {matched}")
    return matched[0].pattern if matched else None


def find_all_matched_patterns(query: str, patterns) -> list[str] | None:
    compiled = [re.compile(p) for p in patterns]
    matched = [p.pattern for p in compiled if p.fullmatch(query)]
    return matched or None


def set_dict_value(config: dict, keys: list[str], value) -> None:
    if len(keys) == 1:
        config[keys[0]] = value
    else:
        config.setdefault(keys[0], {})
        set_dict_value(config[keys[0]], keys[1:], value)


def get_dict_value(config: dict, keys: list[str]):
    if len(keys) == 1:
        return config[keys[0]]
    assert keys[0] in config, f"Unknown key {keys[0]}."
    return get_dict_value(config[keys[0]], keys[1:])


def override_args(config: dict, unknown_args: list[str]) -> tuple[dict, dict]:
    """Apply ``--a:b:c=value`` overrides in place (`utils.py:159-182`)."""
    overridden = {}
    for flag in unknown_args:
        assert flag.startswith("-"), f"Unknown flag {flag}."
        assert "=" in flag, f"Unknown flag {flag}."
        keys, value = flag.removeprefix("-").removeprefix("-").split("=", 1)
        key_list = keys.split(":")
        if value.startswith(":ast:"):
            value = ast.literal_eval(value.removeprefix(":ast:"))
        else:
            try:
                current = get_dict_value(config, key_list)
            except KeyError:
                current = None  # new key (e.g. --checkpoint_path=...): string
            caster = type(current)
            if isinstance(current, bool):
                value = value.lower() in ("1", "true", "yes")
            elif current is None:
                value = None if value == "NA" else value
            else:
                value = caster(value)
        set_dict_value(overridden, key_list, value)
        set_dict_value(config, key_list, value)
    return config, overridden


def flatten_dict(d: dict, new_d: dict, join: str = ":", name: str = "root") -> None:
    for k, v in d.items():
        if isinstance(v, dict):
            flatten_dict(v, new_d, join, f"{name}{join}{k}")
        else:
            new_d[f"{name}{join}{k}"] = v
