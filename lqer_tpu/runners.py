"""Pipeline orchestration: profile → approximate → evaluate ppl → harness.

Equivalent of `/root/reference/src/lqer/runners.py` (406 LoC). The config
file is the pipeline state machine: every stage writes its artifact paths
back into the config and a ``config_after_<stage>.toml`` with that stage's
enable flag flipped off, giving stage-granular resume (`runners.py:348-406`).

TPU-native differences:
* model = (arch config, flat param dict); "device placement" is jit + an
  optional sharding mesh instead of accelerate device maps;
* calibration is an instrumented jitted forward (no hooks);
* the approximator runs batched SVD (no chunked job parallelism needed —
  `chunked_runners.py` is subsumed; a compatible chunked mode still exists in
  :mod:`lqer_tpu.chunked_runners`);
* artifacts are ``.safetensors`` (torch ``.pt`` accepted on load).
"""

from __future__ import annotations

import json
from argparse import ArgumentParser
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import models
from .approximate import get_model_approximator
from .data import get_data_module
from .evaluate import evaluate_perplexity
from .models.checkpoint import (
    load_hf_pretrained,
    load_tensor_dict,
    resolve_model_source,
    save_tensor_dict,
)
from .profiler import ScaleAccumulator, batch_mean_abs_tap
from .utils import (
    get_logger,
    load_config,
    override_args,
    save_config,
)
from .utils import wandb_compat

logger = get_logger("runners")

LQER_TPU_ROOT = Path(__file__).resolve().parents[1]

_DTYPES = {
    "float32": jnp.float32,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
}


def _get_dtype(name: str | None, default: str = "float32"):
    return _DTYPES[name or default]


# ---------------------------------------------------------------------------
# model + data construction
# ---------------------------------------------------------------------------
def build_model_config(config: dict):
    """Arch config from ``model_name``, with an optional ``[model]`` override
    section (TPU-build extension: lets offline tests declare tiny arches)."""
    m = config.get("model")
    if m:
        arch = m.get("arch", "opt")
        kwargs = {k: v for k, v in m.items() if k != "arch"}
        if arch == "opt":
            return models.OPTConfig(**kwargs)
        return models.LlamaConfig(arch=arch, **kwargs)
    return models.get_model_config(config["model_name"])


def build_params(config: dict, cfg, dtype=jnp.float32) -> dict:
    src = resolve_model_source(config["model_name"], config.get("model_dir"))
    if src is not None:
        logger.info("Loading pretrained params from %s", src)
        raw = load_hf_pretrained(src)
        return {k: jnp.asarray(v, dtype=dtype) for k, v in raw.items()}
    seed = int(config.get("init_seed", 0))
    logger.warning(
        "No local checkpoint for %s — using random init (seed=%d). "
        "Set `model_dir` in the config to load real weights.",
        config["model_name"], seed,
    )
    return models.init_params(cfg, jax.random.PRNGKey(seed), dtype)


def _get_tokenizer(config: dict):
    name = config.get("tokenizer_name", config["model_name"])
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(name)
    except Exception as e:
        logger.warning("Tokenizer unavailable (%s); dataset must be synthetic", e)
        return None


def _get_split(config_section: dict, config: dict, split: str) -> np.ndarray:
    name = config_section["dataset"]
    tok = None if name == "synthetic" else _get_tokenizer(config)
    extra = {}
    if name == "synthetic":
        extra = dict(config_section.get("synthetic", {}))
        extra.setdefault("vocab_size", 256)
    data = get_data_module(
        name,
        tokenizer=tok,
        max_length=config_section.get("max_length", 2048),
        num_raw_samples=config_section.get("num_raw_samples"),
        **extra,
    )
    return data[split]


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------
def run_profiler(config: dict, project_path: Path) -> dict:
    """Calibrate per-channel activation scales on the UNQUANTIZED model
    (`runners.py:55-121`)."""
    profile_config = config["profile"]
    dtype = _get_dtype(profile_config.get("dtype"), "float32")
    cfg = build_model_config(config)
    params = build_params(config, cfg, dtype)

    train = _get_split(profile_config, config, "train")
    batch_size = profile_config.get("batch_size", 4)
    num_samples = profile_config.get("num_samples") or len(train)
    num_batches = max(1, num_samples // batch_size)

    acc = ScaleAccumulator()

    # params as an explicit jit argument: closing over them would embed the
    # whole model as HLO constants (huge programs; the remote compiler
    # rejects >~100MB request bodies)
    @jax.jit
    def _profiled(params, ids):
        stats = {}
        logits = models.forward(params, ids, cfg, None,
                                tap=batch_mean_abs_tap(stats))
        return logits, stats

    def profiled(ids):
        return _profiled(params, ids)

    losses = []
    from .evaluate.perplexity import causal_lm_loss

    for bi in range(num_batches):
        batch = train[bi * batch_size : (bi + 1) * batch_size]
        if len(batch) == 0:
            break
        logits, stats = profiled(jnp.asarray(batch))
        acc.update(stats)
        losses.append(float(causal_lm_loss(logits, jnp.asarray(batch))))
        logger.info("Profiling batch %d/%d loss=%.4f", bi + 1, num_batches,
                    losses[-1])

    scale_dict = acc.finalize()
    out = project_path / "scale_dict.safetensors"
    save_tensor_dict(scale_dict, out)
    config["profile"]["scale_dict"] = out.as_posix()
    logger.info("Saved scale_dict (%d entries) to %s", len(scale_dict), out)
    return config


def run_approximator(config: dict, project_path: Path) -> dict:
    """Offline SVD of quantization error (`runners.py:124-192`)."""
    dtype = _get_dtype(config.get("profile", {}).get("dtype"), "float32")
    cfg = build_model_config(config)
    params = build_params(config, cfg, dtype)

    approx_cfg = config["approximate"]
    approximator = get_model_approximator(approx_cfg["name"])(params, approx_cfg)

    if approximator.requires_scale_dict:
        scale_path = config["profile"]["scale_dict"]
        if not Path(scale_path).exists():
            raise FileNotFoundError(
                f"scale_dict does not exist: {scale_path}, but required by "
                f"{approx_cfg['name']}."
            )
        approximator.load_scale_dict(load_tensor_dict(scale_path))

    ret = approximator.compute(
        keep_error_T=approx_cfg.get("keep_error_T", True),
        batch_size=approx_cfg.get("batch_size", 8),
    )

    low_rank_path = project_path / "low_rank_dict.safetensors"
    save_tensor_dict(ret["low_rank_dict"], low_rank_path)
    config["evaluate"]["low_rank_dict"] = low_rank_path.as_posix()

    if ret["error_T_dict"]:
        error_T_path = project_path / "error_T_dict.safetensors"
        save_tensor_dict(ret["error_T_dict"], error_T_path)
        config.setdefault("visualize", {})["error_T_dict"] = error_T_path.as_posix()

    rows = ret["df"]
    wandb_compat.log_table("1/n * ||AB - Q_error^T||_1", rows)
    if rows:
        wandb_compat.log_summary(
            avg_abs_error=sum(r["l1_norm(AB-Q_error_T)/n"] for r in rows)
            / len(rows)
        )
    try:
        import pandas as pd

        df = pd.DataFrame(rows)
        df.to_pickle(project_path / "results.pkl")
        df.describe().to_csv(project_path / "results_summary.csv")
        logger.info("result summary:\n%s", df.describe().to_string())
    except ImportError:
        with open(project_path / "results.json", "w") as f:
            json.dump(rows, f, indent=2)
    return config


def _build_quantized_forward(config: dict, disable_lqer: bool, dtype):
    cfg = build_model_config(config)
    params = build_params(config, cfg, dtype)
    qcfgs = models.quantize_model(cfg, config.get("q_config"),
                                  config.get("l_config"))
    use_backend = bool(config.get("evaluate", {}).get("pallas_backend", False))
    backend = None
    if use_backend and qcfgs is not None:
        # pack BEFORE the PTQ pass (prepare_serving_params needs the
        # original weights) and AFTER A/B load
        if not disable_lqer:
            ab = load_tensor_dict(config["evaluate"]["low_rank_dict"])
            params = models.load_low_rank_dict(params, ab, dtype=dtype)
            logger.info("🔉 Evaluating LQER model")
        from .serving.pallas_backend import prepare_serving_params

        backend = prepare_serving_params(params, cfg, qcfgs)
        params = models.prepare_ptq(params, cfg, qcfgs)
        logger.info("evaluating through the Pallas serving kernels")
    else:
        params = models.prepare_ptq(params, cfg, qcfgs)
        if qcfgs is not None and not disable_lqer:
            ab = load_tensor_dict(config["evaluate"]["low_rank_dict"])
            params = models.load_low_rank_dict(params, ab, dtype=dtype)
            logger.info("🔉 Evaluating LQER model")
        elif qcfgs is not None:
            logger.info("🔉 LQER disabled. Evaluating WxAy without Ak Bk")

    fused_attn = bool(config.get("evaluate", {}).get("fused_attention", False))
    if backend is not None:
        # eval forward with every linear routed through the fused kernels
        # (both arches); the prefill attention kernel engages when eligible
        b_meta = backend["meta"]
        arch_fwd = models.get_arch_module(cfg).forward
        kwargs = {}
        if cfg.arch in ("llama", "mistral"):
            kwargs["fused_attention"] = fused_attn

        @jax.jit
        def jitted_backend(p, b_arrays, ids):
            return arch_fwd(
                p, ids, cfg, qcfgs,
                backend={"arrays": b_arrays, "meta": b_meta}, **kwargs,
            )

        fwd = lambda ids: jitted_backend(params, backend["arrays"], ids)  # noqa: E731
    elif fused_attn and cfg.arch in ("llama", "mistral"):
        logger.info("using fused Pallas attention")
        jitted = jax.jit(lambda p, ids: models.get_arch_module(cfg).forward(
            p, ids, cfg, qcfgs, fused_attention=True))
        fwd = lambda ids: jitted(params, ids)  # noqa: E731
    else:
        jitted = jax.jit(lambda p, ids: models.forward(p, ids, cfg, qcfgs))
        fwd = lambda ids: jitted(params, ids)  # noqa: E731
    return cfg, params, qcfgs, fwd


def run_evaluate_perplexity(config: dict, project_path: Path) -> dict:
    """(`runners.py:195-279`)."""
    eval_config = config["evaluate"]
    eval_ppl_config = eval_config["perplexity"]
    dtype = _get_dtype(eval_config.get("dtype"), "float32")

    _, _, _, fwd = _build_quantized_forward(
        config, eval_config.get("disable_lqer", False), dtype
    )
    test = _get_split(eval_ppl_config, config, "test")
    results = evaluate_perplexity(
        fwd,
        test,
        batch_size=eval_ppl_config.get("batch_size", 4),
        num_samples=eval_ppl_config.get("num_samples"),
        progress=eval_ppl_config.get("progress_bar", True),
        description=f"Evaluating perplexity on {eval_ppl_config['dataset']}...",
    )
    logger.info("results:\n%s", json.dumps(results, indent=4))
    save_file = project_path / (
        eval_ppl_config["dataset"].replace("/", "_") + ".json"
    )
    with open(save_file, "w") as f:
        json.dump(results, f, indent=4)
    wandb_compat.log_table(
        f"{eval_ppl_config['dataset']}_results",
        [{"entry": k, "value": v} for k, v in results.items()],
    )
    wandb_compat.log_summary(
        **{f"{eval_ppl_config['dataset']}_ppl": results["perplexity"]}
    )
    return config


def run_evaluate_harness_downstream(config: dict, project_path: Path) -> dict:
    """Downstream 0-shot tasks via upstream lm-eval (`runners.py:282-345`).

    The reference pins a forked lm-eval submodule; we adapt our JAX model to
    the upstream `lm_eval.api.model.LM` interface instead
    (:mod:`lqer_tpu.evaluate.harness`). Without lm_eval installed, the
    vendored :mod:`lqer_tpu.evaluate.minieval` executes the same protocol on
    bundled ``tiny_*`` tasks; real benchmark task names are skipped with a
    warning in that case (their published numbers need real lm_eval).
    """
    eval_config = config["evaluate"]
    eval_hd_config = eval_config["harness_downstream"]
    dtype = _get_dtype(eval_config.get("dtype"), "float32")

    from .evaluate.harness import HAS_LM_EVAL, evaluate_harness_downstream

    tasks = list(eval_hd_config["datasets"])
    if not HAS_LM_EVAL:
        from .evaluate.minieval import TASK_REGISTRY

        known = [t for t in tasks if t in TASK_REGISTRY]
        if len(known) != len(tasks):
            logger.warning(
                "lm_eval not installed: skipping real benchmark tasks %s "
                "(minieval runs bundled tiny_* fixtures only)",
                [t for t in tasks if t not in TASK_REGISTRY],
            )
        tasks = known
        if not tasks:
            logger.warning("no runnable harness tasks; skipping stage")
            return config

    cfg, params, qcfgs, fwd = _build_quantized_forward(
        config, eval_config.get("disable_lqer", False), dtype
    )
    tokenizer = _get_tokenizer(config)
    # generation tasks decode through the KV-cache engine (one forward per
    # token) instead of the O(s) full re-forward loop; built lazily so
    # loglikelihood-only suites never allocate the cache
    from .serving import DecodeEngine

    def engine():
        return DecodeEngine(
            params, cfg, qcfgs, num_slots=1,
            max_len=eval_hd_config.get("max_length", 2048),
            cache_dtype=dtype,
        )

    results = evaluate_harness_downstream(
        fwd,
        tokenizer,
        tasks=tasks,
        num_fewshot=eval_hd_config.get("num_fewshot", 0),
        batch_size=eval_hd_config.get("batch_size", None),
        max_length=eval_hd_config.get("max_length", 2048),
        engine=engine,
    )
    save_path = project_path / "harness_results.json"
    if save_path.exists():
        n = len(list(project_path.glob("harness_results_*.json")))
        save_path = project_path / f"harness_results_{n}.json"
    with open(save_path, "w") as f:
        json.dump(results, f, indent=4, default=str)
    logger.info("results saved to %s", save_path)
    return config


# ---------------------------------------------------------------------------
# CLI / pipeline driver
# ---------------------------------------------------------------------------
def get_project_path(config: dict, tags: list[str], action: str) -> Path:
    """(`utils.py:185-206`)."""
    if "checkpoint_path" not in config:
        tag = "_".join(tags).replace("/", "-")
        project_path = LQER_TPU_ROOT / "checkpoints" / (
            config["project"].replace("/", "-")
        ) / tag / action
    else:
        project_path = Path(config["checkpoint_path"]).resolve() / action
    if project_path.exists() and any(project_path.iterdir()):
        if not config.get("overwrite_checkpoint", False):
            raise RuntimeError(
                f"Project path {project_path} exists but is not empty."
            )
        logger.warning("Project path %s not empty. Overwriting...", project_path)
    project_path.mkdir(parents=True, exist_ok=True)
    return project_path


def parse_args(action: str, argv=None):
    """(`utils.py:244-264`)."""
    parser = ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("tags", type=str, nargs="*")
    args, unknown = parser.parse_known_args(argv)
    config = load_config(args.config)
    config, overridden = override_args(config, unknown)
    if overridden:
        logger.info("overridden args: %s", overridden)
    tags = args.tags + config.get("tags", [])
    project_path = get_project_path(config, tags=tags, action=action)
    return config, project_path


def run_pipeline(argv=None) -> dict:
    """Profile -> Approximate -> Evaluate (`runners.py:348-406`)."""
    config, prj = parse_args("pipeline", argv)
    wandb_compat.maybe_init(config, "pipeline")

    stage_dirs = {
        "profile": prj.parent / "profile",
        "approximate": prj.parent / "approximate",
        "evaluate_perplexity": prj.parent / "evaluate_perplexity",
        "evaluate_harness_downstream": prj.parent / "evaluate_harness_downstream",
    }

    if config.get("enable_profiling", False):
        logger.info("🚀 Profiling...")
        stage_dirs["profile"].mkdir(parents=True, exist_ok=True)
        config = run_profiler(config, stage_dirs["profile"])
        config["enable_profiling"] = False
        save_config(config, prj / "config_after_profiling.toml")
    if config.get("enable_approximation", False):
        logger.info("🚀 Approximating...")
        stage_dirs["approximate"].mkdir(parents=True, exist_ok=True)
        config = run_approximator(config, stage_dirs["approximate"])
        config["enable_approximation"] = False
        save_config(config, prj / "config_after_approximation.toml")
    if config.get("enable_perplexity_evaluation", False):
        logger.info("🚀 Evaluating perplexity...")
        stage_dirs["evaluate_perplexity"].mkdir(parents=True, exist_ok=True)
        config = run_evaluate_perplexity(config, stage_dirs["evaluate_perplexity"])
        config["enable_perplexity_evaluation"] = False
        save_config(config, prj / "config_after_perplexity_evaluation.toml")
    if config.get("enable_harness_downstream_evaluation", False):
        logger.info("🚀 Evaluating harness downstream...")
        stage_dirs["evaluate_harness_downstream"].mkdir(parents=True, exist_ok=True)
        config = run_evaluate_harness_downstream(
            config, stage_dirs["evaluate_harness_downstream"]
        )
        config["enable_harness_downstream_evaluation"] = False
        save_config(
            config, prj / "config_after_harness_downstream_evaluation.toml"
        )

    save_config(config, prj / "config.toml")
    wandb_compat.finish()
    logger.info("✅ Done.")
    return config
