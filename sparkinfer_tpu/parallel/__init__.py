from .mesh import MeshAxes, make_mesh, shard_cache, shard_params

__all__ = ["MeshAxes", "make_mesh", "shard_cache", "shard_params"]
