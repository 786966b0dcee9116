"""lm-evaluation-harness adapter for downstream 0-shot tasks.

The reference depends on a *forked* lm-eval pinned to its torch models
(`/root/reference/src/lqer/evaluate/harness_evaluate.py:1-2`, submodule
`big-little-llama`). We instead adapt the JAX model to the UPSTREAM
`lm_eval.api.model.LM` interface: loglikelihood is computed from our jitted
forward. This module imports lazily — environments without lm_eval
(like this offline image) can still use everything else.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

try:
    import lm_eval
    from lm_eval.api.model import LM

    HAS_LM_EVAL = True
except ImportError as _e:  # pragma: no cover - env without lm_eval
    HAS_LM_EVAL = False
    _IMPORT_ERROR = _e

    class LM:  # type: ignore
        pass


class JaxCausalLM(LM):
    """Wrap ``forward_fn(input_ids)->logits`` + an HF tokenizer as an
    lm-eval model."""

    def __init__(self, forward_fn: Callable, tokenizer, max_length: int = 2048,
                 batch_size: int = 1, engine=None):
        """``engine``: optional `lqer_tpu.serving.DecodeEngine` — when given,
        `generate_until` decodes incrementally through the KV-cache engine
        instead of re-running the full forward per token."""
        super().__init__()
        self.forward_fn = forward_fn
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self.engine = engine

    # -- helpers -----------------------------------------------------------
    def _loglikelihood_tokens(self, context: list[int], continuation: list[int]):
        ids = (context + continuation)[-self.max_length :]
        n_ctx = len(ids) - len(continuation)
        arr = jnp.asarray(np.array(ids, dtype=np.int32))[None, :]
        logits = np.asarray(self.forward_fn(arr))[0]  # (s, vocab)
        # predictions for continuation tokens come from positions n_ctx-1 ...
        logprobs = logits - _logsumexp(logits)
        ll = 0.0
        greedy = True
        for i, tok in enumerate(continuation):
            pos = n_ctx - 1 + i
            ll += float(logprobs[pos, tok])
            if int(np.argmax(logits[pos])) != tok:
                greedy = False
        return ll, greedy

    # -- LM interface ------------------------------------------------------
    def loglikelihood(self, requests):
        out = []
        for req in requests:
            context, continuation = req.args
            if context == "":
                ctx_ids = [self.tokenizer.bos_token_id or self.tokenizer.eos_token_id]
            else:
                ctx_ids = self.tokenizer.encode(context)
            cont_ids = self.tokenizer.encode(continuation)
            # HF tokenizers may differ on boundary; use joint encoding split
            joint = self.tokenizer.encode(context + continuation)
            if joint[: len(ctx_ids)] == ctx_ids:
                cont_ids = joint[len(ctx_ids):]
            out.append(self._loglikelihood_tokens(ctx_ids, cont_ids))
        return out

    def loglikelihood_rolling(self, requests):
        out = []
        for req in requests:
            (text,) = req.args
            ids = self.tokenizer.encode(text)
            ll, _ = self._loglikelihood_tokens(
                [self.tokenizer.bos_token_id or self.tokenizer.eos_token_id], ids
            )
            out.append(ll)
        return out

    def generate_until(self, requests):
        out = []
        for req in requests:
            context, gen_kwargs = req.args
            until = gen_kwargs.get("until", [])
            max_gen = gen_kwargs.get("max_gen_toks", 128)
            ids = self.tokenizer.encode(context)
            if self.engine is not None:
                from ..serving import Request as _Req

                r = _Req(prompt_ids=list(ids), max_new_tokens=max_gen,
                         eos_token_id=self.tokenizer.eos_token_id)
                self.engine.run([r])
                generated = list(r.output_ids)
                text = self.tokenizer.decode(generated)
                for u in until:
                    if u in text:
                        text = text.split(u)[0]
                out.append(text)
                continue
            generated = []
            text = ""
            for _ in range(max_gen):
                window = (ids + generated)[-self.max_length :]
                arr = jnp.asarray(np.array(window, dtype=np.int32))[None, :]
                logits = np.asarray(self.forward_fn(arr))[0]
                nxt = int(np.argmax(logits[-1]))
                generated.append(nxt)
                text = self.tokenizer.decode(generated)
                if any(u in text for u in until):
                    for u in until:
                        if u in text:
                            text = text.split(u)[0]
                    break
            out.append(text)
        return out


def _logsumexp(x, axis=-1, keepdims=True):
    m = np.max(x, axis=axis, keepdims=True)
    return m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=keepdims))


def evaluate_harness_downstream(
    forward_fn: Callable,
    tokenizer,
    tasks: list[str],
    num_fewshot: int = 0,
    batch_size: int | None = None,
    max_length: int = 2048,
    engine=None,
) -> dict:
    """`lm_eval.simple_evaluate` over our model (`runners.py:313-319`).

    ``engine``: optional `serving.DecodeEngine` for generation tasks —
    `generate_until` then decodes incrementally through the KV cache instead
    of a full re-forward per token."""
    if not HAS_LM_EVAL:
        raise ImportError(f"lm_eval is not installed: {_IMPORT_ERROR}")
    model = JaxCausalLM(forward_fn, tokenizer, max_length=max_length,
                        batch_size=batch_size or 1, engine=engine)
    return lm_eval.simple_evaluate(
        model=model, tasks=tasks, num_fewshot=num_fewshot
    )
