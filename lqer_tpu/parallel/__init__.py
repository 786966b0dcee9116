from .mesh import make_mesh, mesh_shape_for
from .sharding import (
    param_sharding_rules,
    shard_params,
    sharding_for_param,
)
from .tp_forward import make_tp_forward

__all__ = [
    "make_mesh",
    "make_tp_forward",
    "mesh_shape_for",
    "param_sharding_rules",
    "sharding_for_param",
    "shard_params",
]
