"""Runtime tracing — `jax.profiler` integration.

The reference's "profiling" is statistics calibration only (SURVEY.md §5);
real timeline tracing comes free with XLA. Wrap any stage with
:func:`trace` (context manager) or set ``trace_dir`` in a pipeline config to
capture a TensorBoard-loadable trace of the jitted computations.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax

from .logging import get_logger

logger = get_logger("tracing")


@contextlib.contextmanager
def trace(trace_dir: str | None, step_name: str = "lqer"):
    """Capture a jax.profiler trace into ``trace_dir`` (no-op when None)."""
    if not trace_dir:
        yield
        return
    path = Path(trace_dir)
    path.mkdir(parents=True, exist_ok=True)
    logger.info("capturing trace of %s into %s", step_name, path)
    with jax.profiler.trace(str(path)):
        with jax.profiler.TraceAnnotation(step_name):
            yield
    logger.info("trace saved; view with: tensorboard --logdir %s", path)


def annotate(name: str):
    """Decorator adding a named TraceAnnotation around a function."""

    def deco(fn):
        def wrapper(*a, **k):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **k)

        return wrapper

    return deco
