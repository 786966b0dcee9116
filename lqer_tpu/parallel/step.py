"""Sharded forward / train steps over a (dp, tp) mesh.

The reference has no training loop (SURVEY.md §1: "no serving layer, no
training loop"); its quantizers nevertheless define STE backwards for QAT.
Here the STE `custom_vjp` quantizers make the full quantized model
differentiable, so a real sharded train step (QAT-style fine-tuning of the
quantized model, including the low-rank A/B correctors) is available and
doubles as the multi-chip compile validation path (`__graft_entry__.py`).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import models
from ..evaluate.perplexity import causal_lm_loss
from .sharding import shard_params, sharding_for_param


def make_sharded_forward(cfg, layer_qcfgs, mesh: Mesh) -> Callable:
    """jit-compiled forward with params/tokens sharded over (dp, tp): tokens
    are constrained to dp-sharding on this mesh (params carry their own
    NamedShardings from `shard_params`); XLA inserts the TP collectives."""
    data_sharding = NamedSharding(mesh, P("dp", None))

    @jax.jit
    def fwd(params, input_ids):
        input_ids = jax.lax.with_sharding_constraint(input_ids, data_sharding)
        return models.forward(params, input_ids, cfg, layer_qcfgs)

    return fwd


def make_train_step(cfg, layer_qcfgs, mesh: Mesh, lr: float = 1e-4) -> Callable:
    """SGD step on the quantized model (gradients flow through the STE
    quantizers). Params keep their NamedShardings; tokens are dp-sharded."""

    def loss_fn(params, input_ids):
        logits = models.forward(params, input_ids, cfg, layer_qcfgs)
        return causal_lm_loss(logits, input_ids)

    data_sharding = NamedSharding(mesh, P("dp", None))

    @jax.jit
    def train_step(params, input_ids):
        input_ids = jax.lax.with_sharding_constraint(input_ids, data_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(params, input_ids)
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return train_step


def setup_sharded_model(config_cfg, params, mesh: Mesh):
    """device_put params with TP/DP shardings."""
    return shard_params(params, mesh)


__all__ = [
    "make_sharded_forward",
    "make_train_step",
    "setup_sharded_model",
    "sharding_for_param",
]
