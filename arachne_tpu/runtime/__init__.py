from .stats import RunStats

__all__ = ["RunStats"]
from .accuracy import AccuracyStats, evaluate_sam, parse_truth
from .checkpoint import Checkpoint, CheckpointedStream
