"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The reference exercised multi-GPU only on real hardware; the JAX-native
equivalent of a fake cluster is `xla_force_host_platform_device_count`
(SURVEY.md §4d). Flags must be set before jax initializes its backends,
hence the env mutation at import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (registered by a sitecustomize.py on PYTHONPATH in this
# environment) programmatically sets jax_platforms="axon,cpu", overriding the
# env var — win it back explicitly so tests really run on the CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo importable without an editable install.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
