"""Datasets: GPTQ-style concatenated LM evaluation/calibration chunks.

Equivalent of `/root/reference/src/lqer/datasets/` — wikitext2
(`wikitext2.py:4-54`) and SlimPajama-6B (`slim_pajama.py:4-59`): join the raw
split with ``"\\n\\n"``, tokenize, concatenate, chop into ``max_length``
chunks, ``labels = input_ids``. A deterministic ``synthetic`` module is added
for offline/CI use (this environment has no network egress; the HF-backed
modules raise a clear error when the dataset cache is absent).
"""

from __future__ import annotations

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("data")

_HF_DATASET_IDS = {
    "wikitext2": ("wikitext", "wikitext-2-raw-v1"),
    "slim_pajama_6b": ("DKYoon/SlimPajama-6B", None),
}
_TEXT_JOINERS = {"wikitext2": "\n\n", "slim_pajama_6b": "\n\n"}


def _chunk_concatenated(
    texts, tokenizer, max_length: int, joiner: str = "\n\n",
    batch_size: int = 1000,
) -> np.ndarray:
    """GPTQ-style preprocessing (`wikitext2.py:18-52`): one long token stream
    chopped into (n, max_length).

    Byte-parity detail: the reference tokenizes through
    ``datasets.map(batched=True)`` (default batch_size 1000), so texts are
    joined with ``joiner`` *within* each 1000-row batch and consecutive
    batches concatenate with NO joiner between them
    (`wikitext2.py:19-27`) — pinned by
    `tests/test_data_parity.py::test_chunks_match_reference_group_texts`."""
    texts = list(texts)
    ids_parts = [
        np.asarray(
            tokenizer(joiner.join(texts[i:i + batch_size]),
                      return_tensors="np").input_ids[0]
        )
        for i in range(0, len(texts), batch_size)
    ]
    ids = np.concatenate(ids_parts) if ids_parts else np.zeros(0, np.int64)
    n = len(ids) // max_length
    return ids[: n * max_length].reshape(n, max_length).astype(np.int32)


def _load_hf_split(name: str, split: str, num_raw_samples=None):
    import datasets as hf_datasets

    path, config = _HF_DATASET_IDS[name]
    ds = hf_datasets.load_dataset(path, config, split=split)
    if num_raw_samples is not None:
        ds = ds.select(range(min(num_raw_samples, len(ds))))
    return ds["text"]


def synthetic_data_module(
    vocab_size: int = 512,
    max_length: int = 128,
    num_train: int = 16,
    num_test: int = 16,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Deterministic offline stand-in with the same {split: (n, L)} shape."""
    rng = np.random.default_rng(seed)
    make = lambda n, s: rng.integers(  # noqa: E731
        0, vocab_size, size=(n, max_length), dtype=np.int32
    )
    return {
        "train": make(num_train, 0),
        "validation": make(num_test, 1),
        "test": make(num_test, 2),
    }


def get_data_module(
    name: str,
    tokenizer=None,
    max_length: int = 2048,
    num_raw_samples: int | None = None,
    **synthetic_kwargs,
) -> dict[str, np.ndarray]:
    """Name → {split: int32 array (n, max_length)} (`datasets/__init__.py:46-75`).

    ``num_raw_samples`` pre-selects raw rows before tokenization for cheap
    calibration (`datasets/__init__.py:60-66`).
    """
    if name == "synthetic":
        return synthetic_data_module(max_length=max_length, **synthetic_kwargs)
    if name not in _HF_DATASET_IDS:
        raise ValueError(f"Unknown dataset {name!r}")
    assert tokenizer is not None, f"dataset {name} requires a tokenizer"
    out = {}
    for split in ("train", "validation", "test"):
        try:
            texts = _load_hf_split(name, split, num_raw_samples)
        except Exception as e:  # no network / no cache
            raise RuntimeError(
                f"Could not load HF dataset {name}:{split} "
                f"(offline without a cache?): {e}"
            ) from e
        out[split] = _chunk_concatenated(
            texts, tokenizer, max_length, _TEXT_JOINERS[name]
        )
    return out


def batches(split: np.ndarray, batch_size: int):
    """Yield (b, L) batches; the trailing partial batch keeps its true size
    (divergence from the reference documented in SURVEY.md §7: the reference
    weights the last partial batch by the full batch size —
    `evaluate_lm.py:48,66-68`)."""
    for i in range(0, len(split), batch_size):
        yield split[i : i + batch_size]
