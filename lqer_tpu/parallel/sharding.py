"""NamedSharding rules for flat param dicts.

Replaces the reference's layer-placement device maps with real tensor
parallelism — the capability the reference explicitly lacks
("Quantization is not supported for tensor parallelism",
`/root/reference/src/lqer/models/llama_decoder.py:202-204,309-311`).

Megatron-style layout per decoder layer:
* column-parallel (q/k/v/gate/up/fc1): weight ``(out,in)`` sharded on out;
  bias sharded; the low-rank ``B (rank,out)`` sharded on out, ``A (in,rank)``
  replicated — the rank-k bottleneck is tiny, so xA is computed redundantly
  per shard and (xA)·B_shard produces the correctly sharded correction with
  zero extra collectives.
* row-parallel (o_proj/out_proj/down/fc2): weight sharded on in; ``A`` sharded
  on in (x arrives in-sharded, psum folds the partial xA), ``B`` replicated;
  bias replicated.
* embeddings / lm_head: vocab-sharded; norms replicated.

XLA inserts the all-reduce/all-gather collectives from these annotations —
no hand-written NCCL-style code (SURVEY.md §2.9).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex, spec) — first fullmatch wins. Covers OPT + Llama/Mistral names.
_COL = r"(q_proj|k_proj|v_proj|gate_proj|up_proj|fc1)"
_ROW = r"(o_proj|out_proj|down_proj|fc2)"

_RULES: list[tuple[str, P]] = [
    # column-parallel linears
    (rf".*\.{_COL}\.weight", P("tp", None)),
    (rf".*\.{_COL}\.bias", P("tp")),
    (rf".*\.{_COL}\.A", P(None, None)),
    (rf".*\.{_COL}\.B", P(None, "tp")),
    # row-parallel linears
    (rf".*\.{_ROW}\.weight", P(None, "tp")),
    (rf".*\.{_ROW}\.bias", P(None)),
    (rf".*\.{_ROW}\.A", P("tp", None)),
    (rf".*\.{_ROW}\.B", P(None, None)),
    # embeddings + head: vocab-sharded
    (r".*embed_tokens\.weight", P("tp", None)),
    (r".*embed_positions\.weight", P(None, None)),
    (r"lm_head\.weight", P("tp", None)),
    # norms and everything else: replicated
    (r".*", P()),
]

_COMPILED = [(re.compile(pat), spec) for pat, spec in _RULES]


def param_sharding_rules() -> list[tuple[str, P]]:
    return list(_RULES)


def spec_for_param(name: str) -> P:
    for pat, spec in _COMPILED:
        if pat.fullmatch(name):
            return spec
    return P()


def _clip_spec(spec: P, ndim: int) -> P:
    """Truncate/pad a spec to the array rank (1-D bias vs 2-D weight)."""
    entries = list(spec) + [None] * ndim
    return P(*entries[:ndim])


def sharding_for_param(mesh: Mesh, name: str, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, _clip_spec(spec_for_param(name), ndim))


def shard_params(params: dict, mesh: Mesh) -> dict:
    """device_put every param with its rule-derived NamedSharding.

    Dims not divisible by the tp axis fall back to replication (tiny test
    models; real model dims are multiples of any practical tp degree).
    """
    out = {}
    tp = mesh.shape.get("tp", 1)
    for name, arr in params.items():
        spec = _clip_spec(spec_for_param(name), arr.ndim)
        fixed = []
        for dim, axis in zip(arr.shape, spec):
            if axis == "tp" and dim % tp != 0:
                fixed.append(None)
            else:
                fixed.append(axis)
        sh = NamedSharding(mesh, P(*fixed))
        out[name] = jax.device_put(arr, sh)
    return out
