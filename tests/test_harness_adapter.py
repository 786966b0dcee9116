"""Tests for the lm-eval adapter internals (JaxCausalLM) using a fake
tokenizer — lm_eval itself is not installed in this environment, but the
loglikelihood/greedy logic must still be correct."""

import numpy as np
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
        for i in range(s):
            logits[:, i, (ids[:, i] + 1) % vocab] = 10.0
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
