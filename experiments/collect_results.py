#!/usr/bin/env python
"""Collect result JSONs into flat CSVs — thin wrapper over
``lqer_tpu.collect`` (also installable as ``lqer-tpu collect-results``;
reference: `experiments/collect_results.py:21-96`)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lqer_tpu.collect import main  # noqa: E402

if __name__ == "__main__":
    main()
