#!/usr/bin/env python
"""Serving demo CLI — thin wrapper over ``lqer_tpu.serving.cli`` (also
installable as ``lqer-tpu serve``).

Usage:
    python experiments/serve.py <config.toml> --prompt "1 2 3" \
        [--max-new-tokens 16] [--slots 4] [--pallas] [--scan-layers] \
        [--cache-dtype mxint8]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lqer_tpu.serving.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
