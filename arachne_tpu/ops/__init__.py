from . import batch, sw_extend
from .batch import batch_align_single, make_tpu_extender
from .sw_extend import BatchExtender, extend_batch_kernel

__all__ = [
    "BatchExtender",
    "batch",
    "batch_align_single",
    "extend_batch_kernel",
    "make_tpu_extender",
    "sw_extend",
]
