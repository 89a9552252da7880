from .mesh import make_mesh, mesh_shape_for
from .ring_attention import get_ring_mesh, ring_attention, set_ring_mesh
from .sharded_pullback import dp_vmap, make_sharded_pullback, sharded_local_pullback
from .tp import tp_param_specs, tp_shard_params, tp_sharded_leaf_count

__all__ = [
    "dp_vmap",
    "get_ring_mesh",
    "ring_attention",
    "set_ring_mesh",
    "make_mesh",
    "make_sharded_pullback",
    "mesh_shape_for",
    "sharded_local_pullback",
    "tp_param_specs",
    "tp_shard_params",
    "tp_sharded_leaf_count",
]
