from .mesh import make_mesh, mesh_shape_for
from .sharded_pullback import sharded_local_pullback

__all__ = ["make_mesh", "mesh_shape_for", "sharded_local_pullback"]
