"""Perplexity evaluation (GPTQ-style fixed-length chunks).

Equivalent of `/root/reference/src/lqer/evaluate/evaluate_lm.py:11-87`:
``ppl = exp(Σ_i loss_i · bs_i · seq_len / (seq_len · Σ_i bs_i))`` where
``loss_i`` is the HF causal-LM loss (shifted cross-entropy, mean over
``bs·(seq-1)`` positions).

Documented divergence (SURVEY.md §7 "quirks"): the reference multiplies every
batch by the dataloader's nominal batch size, over-weighting a trailing
partial batch (`evaluate_lm.py:48,66-68`); we use the true per-batch size.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..data import batches
from ..utils.logging import get_logger

logger = get_logger("evaluate")


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """HF CausalLM loss: CE of logits[:, :-1] vs labels[:, 1:], mean over all
    shifted positions."""
    logits = logits[:, :-1, :].astype(jnp.float32)
    targets = labels[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def evaluate_perplexity(
    forward_fn: Callable,
    split: np.ndarray,
    batch_size: int = 1,
    num_samples: int | None = None,
    progress: bool = False,
    description: str = "Evaluating perplexity",
) -> dict:
    """``forward_fn(input_ids) -> logits`` (jit it yourself for speed).

    Matches the reference's accumulation (`evaluate_lm.py:58-78`) with the
    actual-batch-size fix.
    """
    if num_samples is not None:
        if num_samples < batch_size:
            raise ValueError(
                f"num_samples {num_samples} must be >= batch_size {batch_size}"
            )
        if num_samples > len(split):
            raise ValueError(
                f"num_samples {num_samples} must be <= dataset size {len(split)}"
            )
        split = split[:num_samples]

    seq_len = split.shape[1]
    total_loss = 0.0
    evaluated = 0
    num_batches = -(-len(split) // batch_size)
    for bi, batch in enumerate(batches(split, batch_size)):
        ids = jnp.asarray(batch)
        logits = forward_fn(ids)
        loss = float(causal_lm_loss(logits, ids))
        bs = batch.shape[0]
        total_loss += loss * bs * seq_len
        evaluated += bs
        if progress:
            logger.info("%s: batch %d/%d loss=%.4f",
                        description, bi + 1, num_batches, loss)

    reduced_loss = total_loss / (seq_len * evaluated)
    try:
        ppl = math.exp(reduced_loss)
    except OverflowError:
        ppl = float("inf")
    return {
        "loss": reduced_loss,
        "perplexity": ppl,
        "num_samples": evaluated,
        "seq_len": seq_len,
        "batch_size": batch_size,
    }
