#!/usr/bin/env python
"""Sweep runner — thin wrapper over ``lqer_tpu.sweep`` (also installable as
``lqer-tpu sweep``); replaces the reference's bash sweep loops
(`experiments/pipeline/sweep_lqer_act.sh:30-81` etc.).

Usage:
    python experiments/sweep.py <template.toml> \
        --method lqer-act \
        --ranks 8 32 --w-bits 4 3 --x-bits 8 \
        --w-blocks "[1,16]" --x-blocks "[1,16]" \
        --save-root checkpoints/sweeps [--dry-run]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lqer_tpu.sweep import main  # noqa: E402

if __name__ == "__main__":
    main()
