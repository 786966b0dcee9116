"""LQER-SVD / L²QER approximators over flat param dicts.

Math parity (reference `/root/reference/src/lqer/approximate/`):

* ``q_error_T = (W - W_q(W))^T``                       (`base.py:43-49`)
* lqer-svd:   ``U,S,V^T = svd(E^T)``;
  ``A = A_q(U_k)``, ``B = B_q(diag(S_k) V^T_k)``        (`lqer_svd.py:36-47`)
* lqer-act:   ``U,S,V^T = svd(diag(s) E^T)``;
  ``A = A_q(diag(s)^{-1} U_k)``, ``B = B_q(diag(S_k) V^T_k)``
  with ``s`` the calibrated per-input-channel scale     (`lqer_act.py:83-97`)
* quality metric ``l1_norm(A@B − target)/numel`` where target is the
  (scaled, for lqer-act) error                          (`lqer_svd.py:119-123`)

TPU-native execution: weights grouped by (shape, config); each group is
stacked and the whole approximate step is ``vmap``-ed, so one XLA program
handles ~num_layers weights at once. With multiple devices the batch axis is
sharded with ``jax.device_put`` + ``NamedSharding`` — this subsumes the
reference's chunked-runner job parallelism (`chunked_runners.py:45-183`).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quantizers import make_quantizer
from ..utils.config import find_matched_pattern
from ..utils.logging import get_logger

logger = get_logger("approximate")


def approximate_weight(
    w: jnp.ndarray,
    rank: int,
    w_quantizer: Callable,
    a_quantizer: Callable,
    b_quantizer: Callable,
    scale: jnp.ndarray | None = None,
):
    """Return ``(A, B, q_error_T)`` for one weight ``(out, in)``.

    ``scale`` is the per-input-channel activation scale (lqer-act); None gives
    plain lqer-svd.
    """
    wf = w.astype(jnp.float32)
    e_t = (wf - w_quantizer(wf)).T  # (in, out)
    if scale is not None:
        target = scale[:, None] * e_t
    else:
        target = e_t
    u, s, vt = jnp.linalg.svd(target, full_matrices=False)
    u_k = u[:, :rank]
    b = s[:rank, None] * vt[:rank, :]
    if scale is not None:
        a = u_k / scale[:, None]
    else:
        a = u_k
    return a_quantizer(a), b_quantizer(b), target


def _l1_metric(a, b, target):
    return jnp.sum(jnp.abs(a @ b - target)) / target.size


class _Group:
    """Weights sharing (shape, quantizer configs, rank) — batched together."""

    def __init__(self, rank, w_q_cfg, a_q_cfg, b_q_cfg):
        self.rank = rank
        self.w_q_cfg = w_q_cfg
        self.a_q_cfg = a_q_cfg
        self.b_q_cfg = b_q_cfg
        self.names: list[str] = []
        self.weights: list = []
        self.scales: list = []


class ModelApproximator:
    """Regex-configured model-level driver (`lqer_svd.py:66-150`,
    `lqer_act.py:116-214`).

    ``config`` matches the reference's ``[approximate]`` section:
    ``{"name": "lqer-svd"|"lqer-act", "approximator": {regex: cfg|"default",
    "default": {...rank, W/A/B_quantizer...}}}``.
    """

    def __init__(self, state_dict: dict, config: dict, name: str | None = None):
        self.config = config
        self.name = name or config.get("name", "lqer-svd")
        assert self.name in ("lqer-svd", "lqer-act"), self.name
        self.requires_scale_dict = self.name == "lqer-act"
        self.entries: dict[str, dict] = {}  # w_name -> {weight, cfg}
        self.scale_dict: dict[str, jnp.ndarray] | None = None

        approx_cfgs = config["approximator"]
        patterns = list(approx_cfgs.keys())
        for w_name, w in state_dict.items():
            entry = find_matched_pattern(w_name, patterns)
            if entry is None:
                continue
            cfg_or_ref = approx_cfgs[entry]
            if isinstance(cfg_or_ref, str):  # "default" indirection
                cfg = approx_cfgs[cfg_or_ref]
            else:
                cfg = cfg_or_ref
            assert isinstance(cfg, dict)
            self.entries[w_name] = {"weight": w, "cfg": cfg}
        if not self.entries:
            logger.error(
                "No matched weight found. Check the config file and weight names."
            )

    def __len__(self):
        return len(self.entries)

    def load_scale_dict(self, scale_dict: dict) -> None:
        """Attach profiler output; keys `<module>.scale`
        (`lqer_act.py:153-159`)."""
        self.scale_dict = {}
        for w_name in self.entries:
            scale_name = ".".join(w_name.split(".")[:-1] + ["scale"])
            s = jnp.asarray(scale_dict[scale_name])
            in_features = self.entries[w_name]["weight"].shape[1]
            assert s.shape == (in_features,), (s.shape, in_features)
            self.scale_dict[w_name] = s

    # ------------------------------------------------------------------
    def _build_groups(self) -> list[_Group]:
        groups: dict[tuple, _Group] = {}
        for w_name, e in self.entries.items():
            cfg = e["cfg"]
            w = e["weight"]
            key = (
                tuple(w.shape),
                repr(sorted(cfg["W_quantizer"].items())),
                repr(sorted(cfg["A_quantizer"].items())),
                repr(sorted(cfg["B_quantizer"].items())),
                cfg["rank"],
            )
            if key not in groups:
                groups[key] = _Group(
                    cfg["rank"], cfg["W_quantizer"], cfg["A_quantizer"],
                    cfg["B_quantizer"],
                )
            g = groups[key]
            g.names.append(w_name)
            g.weights.append(np.asarray(w, dtype=np.float32))
            if self.scale_dict is not None:
                g.scales.append(np.asarray(self.scale_dict[w_name]))
        return list(groups.values())

    def compute(
        self,
        keep_error_T: bool = True,
        batch_size: int = 8,
    ) -> dict:
        """Run the approximation; returns
        ``{"df": rows, "low_rank_dict", "error_T_dict"}`` with low-rank keys
        ``<module>.A`` / ``<module>.B`` (`lqer_svd.py:135-136`)."""
        if self.requires_scale_dict and self.scale_dict is None:
            raise RuntimeError("lqer-act requires load_scale_dict() first")

        rows = []
        low_rank_dict: dict[str, np.ndarray] = {}
        error_T_dict: dict[str, np.ndarray] = {}

        for g in self._build_groups():
            w_q = make_quantizer(g.w_q_cfg)
            a_q = make_quantizer(g.a_q_cfg)
            b_q = make_quantizer(g.b_q_cfg)
            use_scale = self.scale_dict is not None

            def one(w, scale=None):
                a, b, target = approximate_weight(
                    w, g.rank, w_q, a_q, b_q, scale=scale
                )
                return a, b, target, _l1_metric(a, b, target)

            if use_scale:
                batched = jax.jit(jax.vmap(lambda w, s: one(w, s)))
            else:
                batched = jax.jit(jax.vmap(lambda w: one(w)))

            n = len(g.names)
            for start in range(0, n, batch_size):
                sl = slice(start, min(start + batch_size, n))
                ws = jnp.stack(g.weights[sl.start:sl.stop])
                if use_scale:
                    ss = jnp.stack(g.scales[sl.start:sl.stop])
                    a, b, target, metric = batched(ws, ss)
                else:
                    a, b, target, metric = batched(ws)
                a, b, metric = np.asarray(a), np.asarray(b), np.asarray(metric)
                if keep_error_T:
                    target = np.asarray(target)
                for j, w_name in enumerate(g.names[sl.start:sl.stop]):
                    module = ".".join(w_name.split(".")[:-1])
                    low_rank_dict[module + ".A"] = a[j]
                    low_rank_dict[module + ".B"] = b[j]
                    if keep_error_T:
                        error_T_dict[w_name] = target[j]
                    rows.append(
                        {
                            "name": w_name,
                            "rank": g.rank,
                            "l1_norm(AB-Q_error_T)/n": float(metric[j]),
                            "w_dim0": int(ws.shape[1]),
                            "w_dim1": int(ws.shape[2]),
                        }
                    )
                    logger.info(
                        "%-60s 1/n * ||AB - Q_error^T||_1 = %.6f",
                        w_name, float(metric[j]),
                    )

        return {
            "df": rows,
            "low_rank_dict": low_rank_dict,
            "error_T_dict": error_T_dict,
        }


def get_model_approximator(name: str):
    """Name → constructor (`approximate/__init__.py:9-18`)."""
    if name in ("lqer-svd", "lqer-act"):
        return functools.partial(ModelApproximator, name=name)
    raise ValueError(f"model approximator {name!r} not supported")
