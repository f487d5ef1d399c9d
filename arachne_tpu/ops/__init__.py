from . import batch, engine, sw_extend, sw_global, sw_local
from .batch import batch_align_single, make_tpu_extender
from .engine import TpuEngine
from .sw_extend import BatchExtender, extend_batch_kernel
from .sw_global import BatchGlobal
from .sw_local import BatchLocalSW

__all__ = [
    "BatchExtender",
    "BatchGlobal",
    "BatchLocalSW",
    "TpuEngine",
    "batch",
    "batch_align_single",
    "engine",
    "extend_batch_kernel",
    "make_tpu_extender",
    "sw_extend",
    "sw_global",
    "sw_local",
]
