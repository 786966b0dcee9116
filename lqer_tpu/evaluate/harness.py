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
except ImportError:  # env without lm_eval: vendored protocol-parity harness
    HAS_LM_EVAL = False
    from .minieval import LM  # same Instance/LM protocol (see minieval docs)


class JaxCausalLM(LM):
    """Wrap ``forward_fn(input_ids)->logits`` + an HF tokenizer as an
    lm-eval model."""

    def __init__(self, forward_fn: Callable, tokenizer, max_length: int = 2048,
                 batch_size: int = 1, engine=None):
        """``engine``: optional `lqer_tpu.serving.DecodeEngine` — when given,
        `generate_until` decodes incrementally through the KV-cache engine
        instead of re-running the full forward per token. May also be a
        zero-arg factory, built lazily on the first generation request (so
        loglikelihood-only task suites never allocate the KV cache)."""
        super().__init__()
        self.forward_fn = forward_fn
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self._engine = engine

    @property
    def engine(self):
        if self._engine is not None and not hasattr(self._engine, "run"):
            self._engine = self._engine()  # lazy factory
        return self._engine

    # -- helpers -----------------------------------------------------------
    def _score_one(self, logits: np.ndarray, n_ctx: int,
                   continuation: list[int]):
        """Score a continuation from (s, vocab) logits where the sequence is
        context+continuation and ``n_ctx`` is the context length."""
        logprobs = logits - _logsumexp(logits)
        ll = 0.0
        greedy = True
        for i, tok in enumerate(continuation):
            pos = n_ctx - 1 + i
            ll += float(logprobs[pos, tok])
            if int(np.argmax(logits[pos])) != tok:
                greedy = False
        return ll, greedy

    def _loglikelihood_tokens(self, context: list[int], continuation: list[int]):
        return self._loglikelihood_tokens_batched([(context, continuation)])[0]

    def _loglikelihood_tokens_batched(self, pairs):
        """Score (context, continuation) token pairs in padded batches of
        ``self.batch_size``. Right-padding is safe under the causal mask
        (positions before the pad are unaffected), so requests of different
        lengths share one forward."""
        prepped = []  # (ids, n_ctx, continuation)
        for context, continuation in pairs:
            ids = (list(context) + list(continuation))[-self.max_length:]
            prepped.append((ids, len(ids) - len(continuation), continuation))
        results: list = [None] * len(prepped)
        # longest-first so each bucket's pad waste is small
        order = sorted(range(len(prepped)), key=lambda i: -len(prepped[i][0]))
        pad_id = 0
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            width = max(len(prepped[i][0]) for i in chunk)
            arr = np.full((len(chunk), width), pad_id, dtype=np.int32)
            for row, i in enumerate(chunk):
                ids = prepped[i][0]
                arr[row, :len(ids)] = ids
            logits = np.asarray(self.forward_fn(jnp.asarray(arr)))
            for row, i in enumerate(chunk):
                ids, n_ctx, cont = prepped[i]
                results[i] = self._score_one(logits[row, :len(ids)], n_ctx,
                                             cont)
        return results

    def _prefix_token(self) -> int:
        bos = getattr(self.tokenizer, "bos_token_id", None)
        if bos is None:
            bos = getattr(self.tokenizer, "eos_token_id", None)
        return int(bos or 0)

    def _rolling_windows(self, ids: list[int]):
        """Split a long token list into (context, continuation) windows that
        score every token exactly once, each with maximal preceding context
        within ``max_length`` (stride = max_length // 2, like HF's
        strided-perplexity recipe; lm-eval's canonical splitter yields the
        same coverage with window-sized strides)."""
        prefix = [self._prefix_token()]
        full = prefix + list(ids)
        stride = max(self.max_length // 2, 1)
        windows = []
        start = 1  # first scored token is full[1] (= ids[0])
        while start < len(full):
            cont = full[start:start + stride]
            ctx_lo = max(0, start - (self.max_length - len(cont)))
            windows.append((full[ctx_lo:start], cont))
            start += len(cont)
        return windows

    # -- LM interface ------------------------------------------------------
    def loglikelihood(self, requests):
        pairs = []
        for req in requests:
            context, continuation = req.args
            if context == "":
                ctx_ids = [self._prefix_token()]
            else:
                ctx_ids = self.tokenizer.encode(context)
            cont_ids = self.tokenizer.encode(continuation)
            # HF tokenizers may differ on boundary; use joint encoding split
            joint = self.tokenizer.encode(context + continuation)
            if joint[: len(ctx_ids)] == ctx_ids:
                cont_ids = joint[len(ctx_ids):]
            pairs.append((ctx_ids, cont_ids))
        return self._loglikelihood_tokens_batched(pairs)

    def loglikelihood_rolling(self, requests):
        """Full-text loglikelihood, strided over ``max_length`` windows so
        long texts are scored completely instead of truncated."""
        out = []
        for req in requests:
            (text,) = req.args
            ids = self.tokenizer.encode(text)
            windows = self._rolling_windows(ids)
            scores = self._loglikelihood_tokens_batched(windows)
            out.append(sum(ll for ll, _ in scores))
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
    of a full re-forward per token.

    When lm_eval is not installed, dispatches to the vendored
    :mod:`.minieval` (same Instance protocol, bundled ``tiny_*`` tasks) so
    the stage still executes end-to-end; real benchmark names then require
    installing lm_eval."""
    model = JaxCausalLM(forward_fn, tokenizer, max_length=max_length,
                        batch_size=batch_size or 1, engine=engine)
    if HAS_LM_EVAL:
        return lm_eval.simple_evaluate(
            model=model, tasks=tasks, num_fewshot=num_fewshot
        )
    from . import minieval

    return minieval.simple_evaluate(
        model=model, tasks=tasks, num_fewshot=num_fewshot
    )
