"""Multi-host bring-up code path (`parallel/mesh.py::initialize_multihost`).

Real multi-host needs a pod slice; `jax.distributed` nevertheless supports a
single-process "cluster" (num_processes=1), which exercises the actual
bring-up path — coordinator service, distributed client, device enumeration
through the distributed runtime — rather than leaving it untested. Runs in a
subprocess because jax.distributed state is process-global.
"""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})

from lqer_tpu.parallel import make_mesh, shard_params
from lqer_tpu.parallel.mesh import initialize_multihost, tp_over_ici_mesh

initialize_multihost(coordinator_address="localhost:{port}",
                     num_processes=1, process_id=0)
assert jax.process_count() == 1
mesh = tp_over_ici_mesh()
assert mesh.axis_names == ("dp", "tp")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

x = jax.device_put(jnp.arange(8.0 * mesh.size).reshape(mesh.size, 8),
                   NamedSharding(mesh, P("tp", None)))
total = jax.jit(lambda a: a.sum())(x)
print("MULTIHOST_OK", mesh.shape, float(total))
"""


def test_single_process_distributed_bringup():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env_script = _SCRIPT.format(repo=str(REPO), port=port)
    out = subprocess.run(
        [sys.executable, "-c", env_script],
        capture_output=True, text=True, timeout=240,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "JAX_PLATFORMS": "cpu"},
    )
    assert "MULTIHOST_OK" in out.stdout, (out.stdout, out.stderr)
