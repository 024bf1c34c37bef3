"""Pallas TPU kernels for the pipeline's hot memory-bound ops."""

from .colmin import pallas_col_min, pallas_min_trick
from .twomin import pallas_two_min

__all__ = ["pallas_col_min", "pallas_min_trick", "pallas_two_min"]
