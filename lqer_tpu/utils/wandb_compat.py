"""Optional wandb integration (no-op when wandb is unavailable).

The reference logs per-stage tables and run summaries
(`/root/reference/src/lqer/runners.py:151-153,272-277,332-343,364-371`).
This environment does not ship wandb; every call degrades to a logged no-op
so configs with ``enable_wandb=true`` still run.
"""

from __future__ import annotations

from .logging import get_logger

logger = get_logger("wandb")

try:
    import wandb

    HAS_WANDB = True
except ImportError:
    wandb = None
    HAS_WANDB = False

_run = None


def maybe_init(config: dict, job_type: str = "pipeline"):
    """`wandb.init` per the config's [wandb] section (`runners.py:364-371`)."""
    global _run
    if not config.get("enable_wandb"):
        return None
    if not HAS_WANDB:
        logger.warning("enable_wandb=true but wandb is not installed; skipping")
        return None
    wandb_cfg = config.get("wandb", {})
    tags = list(set(wandb_cfg.get("tags", []) + [job_type] + config.get("tags", [])))
    _run = wandb.init(
        project=wandb_cfg.get("project"),
        entity=wandb_cfg.get("entity"),
        job_type=wandb_cfg.get("job_type", job_type),
        tags=tags,
    )
    return _run


def log_table(name: str, rows: list[dict]) -> None:
    if _run is None or not HAS_WANDB:
        return
    if rows:
        cols = list(rows[0].keys())
        table = wandb.Table(columns=cols,
                            data=[[r.get(c) for c in cols] for r in rows])
        wandb.log({name: table})


def log_summary(**kv) -> None:
    if _run is None or not HAS_WANDB:
        return
    for k, v in kv.items():
        _run.summary[k] = v


def finish() -> None:
    global _run
    if _run is not None and HAS_WANDB:
        wandb.finish()
    _run = None
