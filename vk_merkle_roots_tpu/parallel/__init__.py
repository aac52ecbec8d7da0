from .mesh import make_mesh, make_sharded_root_fn
