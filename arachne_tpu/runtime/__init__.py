from .stats import RunStats

__all__ = ["RunStats"]
