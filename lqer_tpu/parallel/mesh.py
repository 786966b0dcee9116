"""Device mesh construction.

TPU-native replacement for the reference's accelerate device maps
(`/root/reference/src/lqer/runners.py:72-78,227-234`,
`experiments/infer_device_map.py:22-44`): one `jax.sharding.Mesh` with
``("dp", "tp")`` axes. Tensor parallelism rides ICI (inner, fastest axis);
data parallelism takes the outer axis (DCN across hosts on a pod).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, tp: int | None = None) -> tuple[int, int]:
    """(dp, tp) shape. Default: all devices in tp (single-host serving)."""
    if tp is None:
        tp = n_devices
    assert n_devices % tp == 0, (n_devices, tp)
    return (n_devices // tp, tp)


def make_mesh(
    n_devices: int | None = None,
    tp: int | None = None,
    devices=None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    dp, tp_ = mesh_shape_for(len(devices), tp)
    import numpy as np

    dev_array = np.asarray(devices).reshape(dp, tp_)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` (SURVEY.md §2.9 —
    the reference has no communication backend; on a TPU pod slice this plus
    `make_mesh(tp=<chips per host×...>)` replaces its accelerate device
    maps). On Cloud TPU all arguments are auto-detected from the metadata
    server; pass them explicitly elsewhere."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def tp_over_ici_mesh(tp_per_host: int | None = None) -> Mesh:
    """Pod-slice convention: tp spans the fast ICI axis within each host's
    chips (inner, contiguous), dp spans hosts over DCN (outer). With
    jax.distributed initialized, `jax.devices()` is ordered host-major, so
    the default reshape already places tp on intra-host chips."""
    n_local = jax.local_device_count()
    tp = tp_per_host or n_local
    return make_mesh(tp=tp)
