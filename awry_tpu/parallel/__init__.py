from .mesh import DATA_AXIS, SHARD_AXIS, make_mesh
from .sharding import ShardedFmEngine

__all__ = ["make_mesh", "ShardedFmEngine", "DATA_AXIS", "SHARD_AXIS"]
