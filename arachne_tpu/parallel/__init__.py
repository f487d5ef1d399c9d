from .mesh import (
    make_mesh,
    replicated_index_arrays,
    sharded_extend,
    sharded_index_arrays,
)

__all__ = [
    "make_mesh",
    "replicated_index_arrays",
    "sharded_extend",
    "sharded_index_arrays",
]
