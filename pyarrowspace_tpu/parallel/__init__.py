from .mesh import DATA_AXIS, make_mesh, row_sharding, replicated
from .sharded import ShardedArrowSpace, build_sharded

__all__ = ["DATA_AXIS", "make_mesh", "row_sharding", "replicated",
           "ShardedArrowSpace", "build_sharded"]
