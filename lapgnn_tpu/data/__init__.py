"""Data layer: cost families, synthetic instances, HDF5 io, split planning."""

from .generators import FAMILIES, SYNTHETIC_FAMILIES

__all__ = ["FAMILIES", "SYNTHETIC_FAMILIES"]
