"""Benchmark layer: rigorous timing harness + experiment logging."""

from .harness import time_rigorous
from .logging_system import BenchmarkLogger

__all__ = ["time_rigorous", "BenchmarkLogger"]
