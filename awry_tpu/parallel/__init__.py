from .mesh import DATA_AXIS, SHARD_AXIS, make_mesh
from .partitioned import PartitionedFmIndex
from .sharding import ShardedFmEngine

__all__ = ["make_mesh", "ShardedFmEngine", "PartitionedFmIndex", "DATA_AXIS", "SHARD_AXIS"]
