from .mesh import (
    ShardedFMTables,
    make_mesh,
    replicated_index_arrays,
    sharded_extend,
)

__all__ = [
    "ShardedFMTables",
    "make_mesh",
    "replicated_index_arrays",
    "sharded_extend",
]
