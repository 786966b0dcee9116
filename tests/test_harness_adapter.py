"""Tests for the lm-eval adapter internals (JaxCausalLM) using a fake
tokenizer — lm_eval itself is not installed in this environment, but the
loglikelihood/greedy logic must still be correct."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lqer_tpu.evaluate.harness import JaxCausalLM


class FakeTok:
    bos_token_id = 0
    eos_token_id = 0

    def encode(self, text):
        return [ord(c) % 50 for c in text]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


def _uniform_forward(vocab=50, favored=None):
    """Deterministic forward: each position prefers (last_token + 1) % vocab."""

    def fwd(ids):
        ids = np.asarray(ids)
        b, s = ids.shape
        logits = np.full((b, s, vocab), -10.0, dtype=np.float32)
        rows = np.arange(b)
        for i in range(s):
            logits[rows, i, (ids[:, i] + 1) % vocab] = 10.0
        return jnp.asarray(logits)

    return fwd


def test_loglikelihood_tokens_greedy_flag():
    lm = JaxCausalLM(_uniform_forward(), FakeTok(), max_length=64)
    # continuation exactly follows the +1 rule -> greedy True, high ll
    ctx = [3, 4]
    cont = [5, 6]
    ll, greedy = lm._loglikelihood_tokens(ctx, cont)
    assert greedy
    assert ll > -0.1  # ~log(1)
    # wrong continuation -> greedy False, low ll
    ll2, greedy2 = lm._loglikelihood_tokens(ctx, [9, 9])
    assert not greedy2
    assert ll2 < ll - 10


def test_loglikelihood_window_clipping():
    lm = JaxCausalLM(_uniform_forward(), FakeTok(), max_length=8)
    ctx = list(range(1, 20))  # longer than max_length
    cont = [20 % 50]
    ll, greedy = lm._loglikelihood_tokens(ctx, cont)
    assert greedy  # last ctx token is 19 -> cont 20 follows the rule


def test_normalized_logprobs():
    # ll must be a proper log-probability (<= 0)
    lm = JaxCausalLM(_uniform_forward(), FakeTok(), max_length=64)
    ll, _ = lm._loglikelihood_tokens([1], [2])
    assert ll <= 0.0


def test_batched_loglikelihood_matches_sequential():
    """Padded-batch scoring must agree exactly with one-at-a-time scoring
    (right padding is causal-safe)."""
    lm1 = JaxCausalLM(_uniform_forward(), FakeTok(), max_length=64,
                      batch_size=1)
    lm4 = JaxCausalLM(_uniform_forward(), FakeTok(), max_length=64,
                      batch_size=4)
    pairs = [
        ([3, 4], [5, 6]),
        ([10], [11, 12, 13]),
        ([7, 8, 9, 10, 11], [12]),
        ([1], [9, 9]),
        ([2, 3, 4], [5]),
    ]
    a = lm1._loglikelihood_tokens_batched(pairs)
    b = lm4._loglikelihood_tokens_batched(pairs)
    for (ll1, g1), (ll4, g4) in zip(a, b):
        assert g1 == g4
        np.testing.assert_allclose(ll1, ll4, rtol=1e-6, atol=1e-6)


def test_rolling_windows_cover_all_tokens_once():
    lm = JaxCausalLM(_uniform_forward(), FakeTok(), max_length=8)
    ids = list(range(1, 30))
    windows = lm._rolling_windows(ids)
    scored = [t for _, cont in windows for t in cont]
    assert scored == ids  # disjoint, complete, in order
    for ctx, cont in windows:
        assert len(ctx) >= 1
        assert len(ctx) + len(cont) <= lm.max_length
    # later windows carry maximal context
    assert all(len(ctx) + len(cont) == lm.max_length
               for ctx, cont in windows[1:-1] or [])


def test_rolling_loglikelihood_scores_long_text():
    """A text longer than max_length must be fully scored (the old adapter
    truncated to the last max_length tokens)."""
    lm = JaxCausalLM(_uniform_forward(), FakeTok(), max_length=8,
                     batch_size=2)

    class Req:
        # 40 chars -> 40 tokens, max_length 8
        args = ("a" * 40,)

    (ll,) = lm.loglikelihood_rolling([Req()])
    # each token is scored: ll is a sum of 40 per-token logprobs, all <= 0
    assert ll <= 0.0
    # every token identical ("a"): under the +1-rule forward nothing is
    # greedy, so the ll must be strongly negative — and scale with length
    class Short:
        args = ("a" * 10,)

    (ll_short,) = lm.loglikelihood_rolling([Short()])
    assert ll < ll_short < 0.0


@pytest.mark.slow
def test_generate_until_via_engine():
    """generate_until should use the decode engine when provided."""
    import jax
    from lqer_tpu import models
    from lqer_tpu.models import OPTConfig
    from lqer_tpu.serving import DecodeEngine
    import jax.numpy as jnp

    cfg = OPTConfig.tiny(vocab_size=64, hidden=32, layers=1, heads=2, ffn=48)
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    engine = DecodeEngine(params, cfg, None, num_slots=1, max_len=64,
                          cache_dtype=jnp.float32)

    class Tok(FakeTok):
        eos_token_id = None

    fwd = lambda ids: models.forward(params, ids, cfg, None)  # noqa: E731
    lm = JaxCausalLM(fwd, Tok(), max_length=64, engine=engine)

    class Req:
        args = ("ab", {"until": [], "max_gen_toks": 4})

    out = lm.generate_until([Req()])
    assert len(out) == 1 and isinstance(out[0], str)

    # engine tokens must equal the full-forward greedy loop
    lm2 = JaxCausalLM(fwd, Tok(), max_length=64, engine=None)
    out2 = lm2.generate_until([Req()])
    assert out == out2, (out, out2)
