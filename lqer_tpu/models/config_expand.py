"""Per-layer quantization-config expansion.

Mirrors `_layer_q_config_builder` / `_layer_l_config_builder`
(`/root/reference/src/lqer/models/llama_decoder.py:423-482`,
`opt_decoder.py:326-372`): a flat ``q_config`` with ``linear`` and
``matmul``/``bmm`` entries expands to one entry per decoder layer, with
``model_layer_{i}`` keys overriding individual layers and ``model_layer``
overriding the default template. The expanded dict is then *resolved* into
concrete quantizer callables per layer.
"""

from __future__ import annotations

from copy import deepcopy

from ..ops.qlinear import QLinearConfig, resolve_qmatmul
from .common import AttnQConfig

# proj-name layout per architecture family
OPT_ATTN_PROJS = ("q_proj", "k_proj", "v_proj", "out_proj")
OPT_MLP_PROJS = ("fc1", "fc2")
LLAMA_ATTN_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj")
LLAMA_MLP_PROJS = ("gate_proj", "up_proj", "down_proj")


def _default_layer_template(q_config: dict, arch: str) -> dict:
    if arch == "opt":
        assert "linear" in q_config and "bmm" in q_config
        linear_cfg, mm_cfg = q_config["linear"], q_config["bmm"]
        return {
            "self_attn": {
                **{p: linear_cfg for p in OPT_ATTN_PROJS},
                "bmm_0": mm_cfg,
                "bmm_1": mm_cfg,
            },
            **{p: linear_cfg for p in OPT_MLP_PROJS},
        }
    else:  # llama / mistral
        assert "linear" in q_config and "matmul" in q_config
        linear_cfg, mm_cfg = q_config["linear"], q_config["matmul"]
        return {
            "self_attn": {
                **{p: linear_cfg for p in LLAMA_ATTN_PROJS},
                "matmul_0": mm_cfg,
                "matmul_1": mm_cfg,
            },
            "mlp": {p: linear_cfg for p in LLAMA_MLP_PROJS},
        }


def _default_layer_l_template(l_config: dict, arch: str) -> dict:
    assert "linear" in l_config
    lin = l_config["linear"]
    if arch == "opt":
        return {
            "self_attn": {p: lin for p in OPT_ATTN_PROJS},
            **{p: lin for p in OPT_MLP_PROJS},
        }
    return {
        "self_attn": {p: lin for p in LLAMA_ATTN_PROJS},
        "mlp": {p: lin for p in LLAMA_MLP_PROJS},
    }


def expand_layer_configs(
    num_layers: int, q_config: dict | None, arch: str
) -> list[dict] | None:
    """Expand to a list of per-layer raw config dicts
    (`llama_decoder.py:444-452`)."""
    if q_config is None:
        return None
    template = q_config.get("model_layer") or _default_layer_template(q_config, arch)
    out = []
    for i in range(num_layers):
        key = f"model_layer_{i}"
        out.append(deepcopy(q_config[key] if key in q_config else template))
    return out


def expand_layer_l_configs(
    num_layers: int, l_config: dict | None, arch: str
) -> list[dict] | None:
    if l_config is None:
        return None
    template = l_config.get("model_layer") or _default_layer_l_template(l_config, arch)
    out = []
    for i in range(num_layers):
        key = f"model_layer_{i}"
        out.append(deepcopy(l_config[key] if key in l_config else template))
    return out


def _lcfg(l_layer: dict | None, *path):
    if l_layer is None:
        return None
    cur = l_layer
    for p in path:
        if cur is None:
            return None
        cur = cur.get(p)
    return cur


def resolve_layer(q_layer: dict, l_layer: dict | None, arch: str) -> dict:
    """Resolve one expanded layer config into callables.

    Returns {"attn": AttnQConfig, "<mlp proj>": QLinearConfig, ...}.
    """
    attn_q = q_layer["self_attn"]
    if arch == "opt":
        attn = AttnQConfig(
            q_proj=QLinearConfig.from_q_config(
                attn_q["q_proj"], _lcfg(l_layer, "self_attn", "q_proj")
            ),
            k_proj=QLinearConfig.from_q_config(
                attn_q["k_proj"], _lcfg(l_layer, "self_attn", "k_proj")
            ),
            v_proj=QLinearConfig.from_q_config(
                attn_q["v_proj"], _lcfg(l_layer, "self_attn", "v_proj")
            ),
            o_proj=QLinearConfig.from_q_config(
                attn_q["out_proj"], _lcfg(l_layer, "self_attn", "out_proj")
            ),
            qk_matmul=resolve_qmatmul(attn_q.get("bmm_0")),
            pv_matmul=resolve_qmatmul(attn_q.get("bmm_1")),
            qk_cfg=attn_q.get("bmm_0"),
            pv_cfg=attn_q.get("bmm_1"),
        )
        return {
            "attn": attn,
            "fc1": QLinearConfig.from_q_config(q_layer["fc1"], _lcfg(l_layer, "fc1")),
            "fc2": QLinearConfig.from_q_config(q_layer["fc2"], _lcfg(l_layer, "fc2")),
        }
    else:
        mlp_q = q_layer["mlp"]
        attn = AttnQConfig(
            q_proj=QLinearConfig.from_q_config(
                attn_q["q_proj"], _lcfg(l_layer, "self_attn", "q_proj")
            ),
            k_proj=QLinearConfig.from_q_config(
                attn_q["k_proj"], _lcfg(l_layer, "self_attn", "k_proj")
            ),
            v_proj=QLinearConfig.from_q_config(
                attn_q["v_proj"], _lcfg(l_layer, "self_attn", "v_proj")
            ),
            o_proj=QLinearConfig.from_q_config(
                attn_q["o_proj"], _lcfg(l_layer, "self_attn", "o_proj")
            ),
            qk_matmul=resolve_qmatmul(attn_q.get("matmul_0")),
            pv_matmul=resolve_qmatmul(attn_q.get("matmul_1")),
            qk_cfg=attn_q.get("matmul_0"),
            pv_cfg=attn_q.get("matmul_1"),
        )
        return {
            "attn": attn,
            **{
                p: QLinearConfig.from_q_config(mlp_q[p], _lcfg(l_layer, "mlp", p))
                for p in LLAMA_MLP_PROJS
            },
        }


def resolve_model_configs(
    num_layers: int, q_config: dict | None, l_config: dict | None, arch: str
) -> list[dict] | None:
    """Full expansion + resolution for a model. None q_config → FP model."""
    if q_config is None:
        return None
    q_layers = expand_layer_configs(num_layers, q_config, arch)
    l_layers = expand_layer_l_configs(num_layers, l_config, arch)
    return [
        resolve_layer(q_layers[i], l_layers[i] if l_layers else None, arch)
        for i in range(num_layers)
    ]


def attn_qcfg_equal(a, b) -> bool:
    """AttnQConfig equality by CONFIG, not by callable identity: the matmul
    closures from `resolve_qmatmul` are fresh objects per layer even for
    identical configs, so dataclass eq is useless here; the proj
    QLinearConfigs hold memoized quantizers so their eq works."""
    return (
        a.q_proj == b.q_proj and a.k_proj == b.k_proj
        and a.v_proj == b.v_proj and a.o_proj == b.o_proj
        and a.qk_cfg == b.qk_cfg and a.pv_cfg == b.pv_cfg
    )


def layer_qcfg_equal(a: dict, b: dict) -> bool:
    """Equality of two resolved per-layer configs (quantizer callables are
    memoized per distinct config, so identity-based dataclass equality is
    exact)."""
    if set(a) != set(b):
        return False
    for k in a:
        if k == "attn":
            if not attn_qcfg_equal(a[k], b[k]):
                return False
        elif a[k] != b[k]:
            return False
    return True


def layer_qcfg_segments(layer_qcfgs, num_layers: int):
    """Consecutive [start, end) runs of layers sharing one resolved config.

    The scan paths trace ONE layer body per segment, so a model with
    ``model_layer_{i}`` overrides (`llama_decoder.py:423-482` — the
    reference's per-layer mixed-precision surface) costs one compile per
    distinct run of configs instead of falling back to a fully unrolled
    forward."""
    if layer_qcfgs is None:
        return [(0, num_layers, None)]
    assert len(layer_qcfgs) == num_layers
    segments = []
    start = 0
    for i in range(1, num_layers):
        if not layer_qcfg_equal(layer_qcfgs[i], layer_qcfgs[start]):
            segments.append((start, i, layer_qcfgs[start]))
            start = i
    segments.append((start, num_layers, layer_qcfgs[start]))
    return segments


def layer_qcfgs_uniform(layer_qcfgs) -> bool:
    """True when every layer resolved to the same quantizer configuration —
    the requirement for the lax.scan decode path (one traced layer body).
    Heterogeneous per-layer configs (``model_layer_{i}`` overrides) must use
    the unrolled step."""
    if layer_qcfgs is None or len(layer_qcfgs) <= 1:
        return True
    ref = layer_qcfgs[0]
    for q in layer_qcfgs[1:]:
        if set(q) != set(ref):
            return False
        for k in ref:
            if k == "attn":
                if not attn_qcfg_equal(q[k], ref[k]):
                    return False
            elif q[k] != ref[k]:
                return False
    return True
