"""Golden-value regression for the tiny offline pipeline.

The oracle tests elsewhere check ORDERING and cross-implementation parity;
this file pins absolute numbers: the debug opt-tiny pipeline (fixed init
seed, synthetic data) must reproduce the recorded perplexity, calibration
scales, and low-rank factors to tight tolerance. Catches silent numeric
drift that stays within orderings (quantizer edits, accumulation changes,
config plumbing).

Regenerate after an INTENDED numeric change:
    python tests/test_golden_regression.py --regen
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
GOLDEN = Path(__file__).resolve().parent / "golden" / "tiny_pipeline.json"
CONFIG = REPO / "experiments/configs/debug/opt-tiny.toml"


def _run_pipeline(tmp_dir: Path) -> dict:
    from lqer_tpu.models.checkpoint import load_tensor_dict
    from lqer_tpu.runners import run_pipeline
    from lqer_tpu.utils.config import load_config, save_config

    cfg = load_config(CONFIG)
    cfg["checkpoint_path"] = str(tmp_dir / "ckpt")
    cfg["overwrite_checkpoint"] = True
    cfg_path = tmp_dir / "golden.toml"
    save_config(cfg, cfg_path)
    out = run_pipeline([str(cfg_path)])

    ckpt = tmp_dir / "ckpt"
    with open(next((ckpt / "evaluate_perplexity").glob("*.json"))) as f:
        ppl = json.load(f)
    scales = load_tensor_dict(out["profile"]["scale_dict"])
    low_rank = load_tensor_dict(out["evaluate"]["low_rank_dict"])

    s_key = sorted(scales)[0]
    fc1 = "model.decoder.layers.0.fc1"
    return {
        "perplexity": float(ppl["perplexity"]),
        "loss": float(ppl["loss"]),
        "scale_key": s_key,
        "scale_head": np.asarray(scales[s_key])[:8].tolist(),
        "B_row_norm": float(np.linalg.norm(np.asarray(low_rank[fc1 + ".B"])[0])),
        "A_col_norm": float(
            np.linalg.norm(np.asarray(low_rank[fc1 + ".A"])[:, 0])),
        "n_low_rank": len(low_rank),
    }


def test_tiny_pipeline_matches_golden(tmp_path):
    if not GOLDEN.exists():
        pytest.skip("golden fixture missing — regenerate with --regen")
    got = _run_pipeline(tmp_path)
    want = json.loads(GOLDEN.read_text())
    assert got["scale_key"] == want["scale_key"]
    assert got["n_low_rank"] == want["n_low_rank"]
    np.testing.assert_allclose(got["perplexity"], want["perplexity"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["loss"], want["loss"], rtol=1e-4)
    np.testing.assert_allclose(got["scale_head"], want["scale_head"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["B_row_norm"], want["B_row_norm"],
                               rtol=1e-3)
    np.testing.assert_allclose(got["A_col_norm"], want["A_col_norm"],
                               rtol=1e-3)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile

        sys.path.insert(0, str(REPO))
        import jax

        jax.config.update("jax_platforms", "cpu")
        with tempfile.TemporaryDirectory() as td:
            vals = _run_pipeline(Path(td))
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN.write_text(json.dumps(vals, indent=2) + "\n")
        print(f"wrote {GOLDEN}")
