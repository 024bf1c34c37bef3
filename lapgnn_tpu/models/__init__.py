"""flax.linen model zoo: OneGNN (fast row-dual MLP) and DualGNN (gold standard)."""

from .dual_gnn import DualGNN, DualLayer
from .one_gnn import OneGNN, ResidualBlock

__all__ = ["DualGNN", "DualLayer", "OneGNN", "ResidualBlock"]
