from .mesh import make_mesh, mesh_shape_for
from .sharded_pullback import dp_vmap, make_sharded_pullback, sharded_local_pullback

__all__ = [
    "dp_vmap",
    "make_mesh",
    "make_sharded_pullback",
    "mesh_shape_for",
    "sharded_local_pullback",
]
