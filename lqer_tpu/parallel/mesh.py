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
