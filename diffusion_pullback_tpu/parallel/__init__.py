from .mesh import make_mesh, mesh_shape_for
from .sharded_pullback import dp_vmap, make_sharded_pullback, sharded_local_pullback
from .tp import tp_param_specs, tp_shard_params, tp_sharded_leaf_count

__all__ = [
    "dp_vmap",
    "make_mesh",
    "make_sharded_pullback",
    "mesh_shape_for",
    "sharded_local_pullback",
    "tp_param_specs",
    "tp_shard_params",
    "tp_sharded_leaf_count",
]
