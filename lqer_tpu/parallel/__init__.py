from .mesh import make_mesh, mesh_shape_for
from .sharding import (
    param_sharding_rules,
    shard_params,
    sharding_for_param,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "param_sharding_rules",
    "sharding_for_param",
    "shard_params",
]
