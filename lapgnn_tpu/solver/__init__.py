"""LAP solver layer: batched JAX JV, seeded warm-start, host oracle, wrappers."""

from .jv import Matching, augment_all, column_reduction, lapjv_batch, lapjv_single, matching_cost
from .seeded import (
    SeededResult,
    default_tight_eps,
    greedy_tight_matching,
    lapjv_seeded_batch,
    lapjv_seeded_single,
)

__all__ = [
    "Matching",
    "augment_all",
    "column_reduction",
    "lapjv_batch",
    "lapjv_single",
    "matching_cost",
    "SeededResult",
    "default_tight_eps",
    "greedy_tight_matching",
    "lapjv_seeded_batch",
    "lapjv_seeded_single",
]
