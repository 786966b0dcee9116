#!/usr/bin/env python
"""Pipeline entry point (reference: `experiments/pipeline/pipeline.py:1-11`).

Usage:
    python experiments/pipeline.py <config.toml> [tags...] [--a:b:c=v ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lqer_tpu.runners import run_pipeline  # noqa: E402

if __name__ == "__main__":
    run_pipeline()
