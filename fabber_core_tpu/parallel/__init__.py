from .mesh import voxel_mesh, shard_engine  # noqa: F401
