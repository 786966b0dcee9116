"""HF-backed data modules exercised offline with mocked datasets.

The wikitext2 / slim_pajama_6b loaders need network in production; here the
HF `load_dataset` call is mocked with a recorded-style fixture so the ACTUAL
preprocessing (join with "\\n\\n", tokenize, concatenate, chop into
max_length chunks — `wikitext2.py:18-52` semantics) runs rather than staying
untested until the first online run.
"""

from unittest import mock

import numpy as np
import pytest

from lqer_tpu.data import _chunk_concatenated, batches, get_data_module


class WordTok:
    """Whitespace tokenizer with a stable vocab (stand-in for HF's API)."""

    def __call__(self, text, return_tensors=None):
        toks = text.split()
        vocab = {}
        ids = []
        for t in toks:
            ids.append(vocab.setdefault(t, hash(t) % 1000))

        class Out:
            input_ids = np.asarray([ids])

        return Out()


class _FakeDS:
    def __init__(self, rows):
        self.rows = rows

    def select(self, idx):
        return _FakeDS([self.rows[i] for i in idx])

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, key):
        assert key == "text"
        return self.rows


_FIXTURE = {
    "train": [f"the quick brown fox {i} jumps over the lazy dog" * 3
              for i in range(20)],
    "validation": [f"valley of text number {i} with some words" * 2
                   for i in range(8)],
    "test": [f"test document {i} padding words here" * 4 for i in range(8)],
}


def _fake_load_dataset(path, config, split=None):
    assert path in ("wikitext", "DKYoon/SlimPajama-6B")
    if path == "wikitext":
        assert config == "wikitext-2-raw-v1"
    return _FakeDS(_FIXTURE[split])


@pytest.mark.parametrize("name", ["wikitext2", "slim_pajama_6b"])
def test_hf_module_chunking(name):
    with mock.patch("datasets.load_dataset", side_effect=_fake_load_dataset):
        data = get_data_module(name, tokenizer=WordTok(), max_length=32)
    for split in ("train", "validation", "test"):
        arr = data[split]
        assert arr.ndim == 2 and arr.shape[1] == 32
        assert arr.dtype == np.int32
        assert len(arr) >= 1
    # GPTQ-style determinism: same inputs -> same chunks
    with mock.patch("datasets.load_dataset", side_effect=_fake_load_dataset):
        again = get_data_module(name, tokenizer=WordTok(), max_length=32)
    np.testing.assert_array_equal(data["test"], again["test"])


def test_num_raw_samples_preselect():
    """`num_raw_samples` limits raw rows BEFORE tokenization
    (`datasets/__init__.py:60-66`)."""
    with mock.patch("datasets.load_dataset", side_effect=_fake_load_dataset):
        small = get_data_module("wikitext2", tokenizer=WordTok(),
                                max_length=32, num_raw_samples=2)
        full = get_data_module("wikitext2", tokenizer=WordTok(), max_length=32)
    assert len(small["train"]) < len(full["train"])


def test_chunking_matches_reference_semantics():
    """Join -> tokenize -> concat -> chop: the whole stream is one sequence,
    so chunk boundaries ignore document boundaries and the tail is dropped
    (`wikitext2.py:18-52`)."""
    tok = WordTok()
    texts = ["a b c", "d e f g"]
    arr = _chunk_concatenated(texts, tok, max_length=3)
    joined_ids = tok("a b c \n\n d e f g".replace(" \n\n ", "\n\n"),
                     ).input_ids[0]
    # "\n\n" joins without spaces: "a b c\n\nd e f g" -> whitespace split
    # fuses "c\n\nd" into one token — exactly what the joined stream yields
    n = len(joined_ids) // 3
    np.testing.assert_array_equal(arr, joined_ids[: n * 3].reshape(n, 3))


def test_offline_without_cache_raises_clearly():
    def boom(*a, **k):
        raise ConnectionError("no network")

    with mock.patch("datasets.load_dataset", side_effect=boom):
        with pytest.raises(RuntimeError, match="offline"):
            get_data_module("wikitext2", tokenizer=WordTok(), max_length=32)


def test_batches_trailing_partial():
    split = np.arange(10 * 4, dtype=np.int32).reshape(10, 4)
    bs = list(batches(split, 4))
    assert [len(b) for b in bs] == [4, 4, 2]
