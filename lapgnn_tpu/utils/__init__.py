"""Utilities: stage profiling, device traces."""

from .profiling import StageProfiler, profile_pipeline, trace

__all__ = ["StageProfiler", "profile_pipeline", "trace"]
