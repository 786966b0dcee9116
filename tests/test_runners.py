"""Runner-level test: the full 3-stage pipeline on the debug config in a
temp checkpoint dir, plus stage resume."""

import json
from pathlib import Path

from lqer_tpu.runners import run_pipeline
from lqer_tpu.utils import load_config

CONFIG = Path(__file__).resolve().parents[1] / "experiments/configs/debug/opt-tiny.toml"


def test_pipeline_stages_and_resume(tmp_path):
    argv = [
        str(CONFIG), "pytest",
        f"--checkpoint_path={tmp_path}",
        "--overwrite_checkpoint=:ast:True",
    ]
    config = run_pipeline(argv)

    # stage artifacts
    assert (tmp_path / "profile/scale_dict.safetensors").exists()
    assert (tmp_path / "approximate/low_rank_dict.safetensors").exists()
    ppl_file = tmp_path / "evaluate_perplexity/synthetic.json"
    assert ppl_file.exists()
    with open(ppl_file) as f:
        results = json.load(f)
    assert results["perplexity"] > 1.0
    assert results["num_samples"] == 8

    # stage-resume config: flags flipped off, artifact paths written back
    resume_cfg_path = tmp_path / "pipeline/config_after_approximation.toml"
    assert resume_cfg_path.exists()
    resume_cfg = load_config(resume_cfg_path)
    assert resume_cfg["enable_profiling"] is False
    assert resume_cfg["enable_approximation"] is False
    assert resume_cfg["enable_perplexity_evaluation"] is True
    assert Path(resume_cfg["evaluate"]["low_rank_dict"]).exists()
    assert Path(resume_cfg["profile"]["scale_dict"]).exists()

    # resuming from it runs only the eval stage (fresh eval dir)
    (tmp_path / "evaluate_perplexity/synthetic.json").unlink()
    run_pipeline([str(resume_cfg_path), "resume",
                  f"--checkpoint_path={tmp_path}",
                  "--overwrite_checkpoint=:ast:True"])
    assert ppl_file.exists()


def test_pipeline_pallas_backend_eval(tmp_path):
    """evaluate.pallas_backend=true routes the perplexity eval through the
    fused serving kernels (fused qkv + MLP megakernel, interpret on CPU);
    ppl must agree with the emulated eval to kernel-accumulation tolerance."""
    cfg_path = Path(__file__).resolve().parents[1] / \
        "experiments/configs/debug/llama-tiny-pallas.toml"

    def run(tag, extra):
        d = tmp_path / tag
        config = run_pipeline([
            str(cfg_path), tag,
            f"--checkpoint_path={d}",
            "--overwrite_checkpoint=:ast:True",
        ] + extra)
        with open(d / "evaluate_perplexity/synthetic.json") as f:
            return json.load(f)["perplexity"]

    ppl_kernel = run("kernel", [])
    ppl_emul = run("emul", ["--evaluate:pallas_backend=:ast:False"])
    assert abs(ppl_kernel - ppl_emul) / ppl_emul < 0.02, (ppl_kernel, ppl_emul)
