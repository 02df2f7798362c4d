"""Utilities: timing, logging helpers."""

from .timing import PrecTimers, total_times

__all__ = ["PrecTimers", "total_times"]
