"""Real-tokenizer data-pipeline parity vs the reference's ACTUAL code.

Round-3 VERDICT item 9: the data loaders were previously exercised only
against mocked HF datasets, leaving the tokenize-join-chunk byte behavior
unpinned. Here a real byte-level BPE tokenizer is constructed locally (no
network) and the reference's `preprocess_data_module_wikitext2`
(`/root/reference/src/lqer/datasets/wikitext2.py:10-54`) is imported and
executed in-process as the oracle — including its `datasets.map(batched=
True)` semantics where texts join "\\n\\n" per 1000-row batch and batches
concatenate with no joiner (the divergence this test caught)."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

from lqer_tpu.data import _chunk_concatenated

_REF_WIKITEXT2 = Path("/root/reference/src/lqer/datasets/wikitext2.py")


def _load_ref_wikitext2():
    if not _REF_WIKITEXT2.is_file():
        return None
    spec = importlib.util.spec_from_file_location(
        "ref_wikitext2", _REF_WIKITEXT2)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_real_tokenizer():
    """A real byte-level BPE tokenizer built offline: actual `tokenizers`
    machinery (pre-tokenization, merges, special tokens) wrapped in
    transformers' fast-tokenizer API — the same call surface
    (`tokenizer(text, return_tensors=...)`) the HF-checkpoint tokenizers
    expose."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "wikitext has headings = like this = and empty lines",
        "0 1 2 3 4 5 6 7 8 9 , . ( ) \" ' @-@",
    ]
    tok.train_from_iterator(corpus * 8, trainer)
    return PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|endoftext|>",
        pad_token="<|endoftext|>",
    )


def _fixture_rows(n: int) -> list[str]:
    """wikitext-shaped rows: blank lines, ' = heading = ' rows, prose with
    trailing spaces — deterministic, > 1000 rows to cross the reference's
    map batch boundary."""
    rows = []
    for i in range(n):
        if i % 7 == 0:
            rows.append("")
        elif i % 7 == 1:
            rows.append(f" = Section {i} = \n")
        else:
            rows.append(
                f" the quick brown fox {i} jumps over the lazy dog "
                f"with five dozen jugs . \n"
            )
    return rows


@pytest.fixture(scope="module")
def tokenizer():
    return _make_real_tokenizer()


def test_chunks_match_reference_group_texts(tokenizer):
    """Byte-for-byte chunk parity with the reference preprocessing across a
    map-batch boundary (1200 rows > datasets' default batch_size 1000)."""
    ref_mod = _load_ref_wikitext2()
    if ref_mod is None:
        pytest.skip("reference mount unavailable")
    import datasets as hf_datasets

    rows = _fixture_rows(1200)
    max_length = 64
    raw = hf_datasets.DatasetDict({
        "train": hf_datasets.Dataset.from_dict({"text": rows}),
        "validation": hf_datasets.Dataset.from_dict({"text": rows[:50]}),
        "test": hf_datasets.Dataset.from_dict({"text": rows[200:400]}),
    })
    ref = ref_mod.preprocess_data_module_wikitext2(
        raw, tokenizer, max_length=max_length, num_proc=1)

    for split in ("train", "validation", "test"):
        ours = _chunk_concatenated(
            raw[split]["text"], tokenizer, max_length, "\n\n")
        theirs = np.array(ref[split]["input_ids"], dtype=np.int32)
        assert ours.shape == theirs.shape, (split, ours.shape, theirs.shape)
        np.testing.assert_array_equal(ours, theirs, err_msg=split)
        # labels = input_ids in the reference contract
        np.testing.assert_array_equal(
            theirs, np.array(ref[split]["labels"], dtype=np.int32))


def test_batch_boundary_has_no_joiner(tokenizer):
    """Rows 999|1000 must concatenate WITHOUT the '\\n\\n' joiner (the
    reference's map-batch semantics); a naive whole-split join differs."""
    rows = _fixture_rows(1200)
    ours = _chunk_concatenated(rows, tokenizer, 64, "\n\n")
    naive_ids = tokenizer("\n\n".join(rows), return_tensors="np").input_ids[0]
    n = len(naive_ids) // 64
    naive = naive_ids[: n * 64].reshape(n, 64).astype(np.int32)
    assert not np.array_equal(ours, naive), (
        "expected the batch-boundary join to differ from a whole-split join"
    )


def test_single_batch_equals_whole_join(tokenizer):
    """Under 1000 rows the two joins coincide (the mocked-dataset tests'
    regime stays valid)."""
    rows = _fixture_rows(120)
    ours = _chunk_concatenated(rows, tokenizer, 32, "\n\n")
    naive_ids = tokenizer("\n\n".join(rows), return_tensors="np").input_ids[0]
    n = len(naive_ids) // 32
    naive = naive_ids[: n * 32].reshape(n, 32).astype(np.int32)
    np.testing.assert_array_equal(ours, naive)
