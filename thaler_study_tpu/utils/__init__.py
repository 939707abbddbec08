"""Profiling and instrumentation utilities."""

from .counters import COUNTS, count_round

__all__ = ["COUNTS", "count_round"]
