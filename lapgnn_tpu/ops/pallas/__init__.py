"""Pallas TPU kernels for the pipeline's hot memory-bound ops."""

from .colmin import pallas_col_min, pallas_min_trick
from .rowstats import pallas_row_stats
from .twomin import pallas_two_min

__all__ = ["pallas_col_min", "pallas_min_trick", "pallas_row_stats", "pallas_two_min"]
