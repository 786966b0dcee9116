"""Chunked approximation + merge workflow (`chunked_runners.py` parity)."""

import glob

import jax
import numpy as np

from lqer_tpu import models
from lqer_tpu.approximate import ModelApproximator
from lqer_tpu.chunked_runners import merge_chunks, run_approximator_chunk
from lqer_tpu.models import OPTConfig
from lqer_tpu.models.checkpoint import load_tensor_dict


def _config(tmp_path, chunk_idx, chunk_size):
    wq = {
        "name": "block_fp", "width": 4, "exponent_width": 8,
        "exponent_bias": None, "block_size": [1, 16], "skip_first_dim": False,
    }
    ab = dict(wq, width=8, block_size=[16, 1])
    return {
        "model_name": "test/opt-tiny",
        "model": {
            "arch": "opt", "vocab_size": 128, "hidden_size": 32,
            "ffn_dim": 64, "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 64,
        },
        "init_seed": 0,
        "evaluate": {},
        "approximate": {
            "name": "lqer-svd",
            "chunk_size": chunk_size,
            "chunk_idx": chunk_idx,
            "keep_error_T": False,
            "approximator": {
                r"model\.decoder\.layers\.[0-9]+\.self_attn\.(k|q|v|out)_proj\.weight": "default",
                r"model\.decoder\.layers\.[0-9]+\.(fc1|fc2)\.weight": "default",
                "default": {
                    "rank": 4,
                    "W_quantizer": dict(wq),
                    "A_quantizer": dict(ab),
                    "B_quantizer": dict(ab),
                },
            },
        },
    }


def test_chunked_matches_unchunked(tmp_path):
    # 2 layers x 6 linears = 12 weights; chunk_size 5 -> 3 chunks
    chunk_size = 5
    for idx in range(3):
        cfg_dict = _config(tmp_path, idx, chunk_size)
        run_approximator_chunk(cfg_dict, tmp_path)

    assert len(glob.glob(str(tmp_path / "config_chunk_*.toml"))) == 3
    merged_cfg = merge_chunks(tmp_path)
    paths = merged_cfg["evaluate"]["low_rank_dict"]
    assert isinstance(paths, list) and len(paths) == 3

    merged = load_tensor_dict(paths)

    # oracle: unchunked approximator on the same params
    cfg_dict = _config(tmp_path, 0, chunk_size)
    cfg = models.OPTConfig(**{k: v for k, v in cfg_dict["model"].items()
                              if k != "arch"})
    params = models.init_params(cfg, jax.random.PRNGKey(0))
    approx = ModelApproximator(params, cfg_dict["approximate"])
    full = approx.compute(keep_error_T=False)["low_rank_dict"]

    assert set(merged.keys()) == set(full.keys())
    for k in full:
        np.testing.assert_allclose(merged[k], np.asarray(full[k]),
                                   atol=1e-5, rtol=1e-5)
