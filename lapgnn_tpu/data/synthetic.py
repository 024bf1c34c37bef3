"""Synthetic training instances: cost + optimal matching + oracle duals.

Mirrors ``/root/reference/data/generators.py:84-147``: draw a cost matrix
from a family, solve it (SciPy LSA oracle), reconstruct optimal duals via
difference constraints (NumPy min-plus fixpoint), optionally perturb the
duals with Gaussian noise and re-project to feasibility.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import scipy.optimize

from ..ops.host_dual import (
    duals_from_matching_np,
    make_feasible_duals_np,
    project_feasible_np,
)
from .generators import FAMILIES

__all__ = ["SyntheticInstance", "generate_synthetic_instance"]


@dataclass
class SyntheticInstance:
    """One labelled LAP instance (data/generators.py:84-94)."""

    cost: np.ndarray
    rows: np.ndarray
    cols: np.ndarray
    u: np.ndarray
    v: np.ndarray
    family: str
    size: int
    noise_std: float
    tag: Optional[str] = None


def generate_synthetic_instance(
    family: str,
    n: int,
    rng: Optional[np.random.Generator] = None,
    noise_probability: float = 0.2,
    noise_std: float = 0.15,
    dual_noise_prob: float = 0.0,
) -> SyntheticInstance:
    """Generate one labelled instance (data/generators.py:97-147).

    ``noise_probability`` is a LEGACY no-op kept for reference signature
    parity (the reference documents it as "if implemented",
    data/generators.py:111); label noise is controlled by
    ``dual_noise_prob``/``noise_std`` instead.
    """
    if family not in FAMILIES:
        raise KeyError(f"Unknown family '{family}'. Known: {sorted(FAMILIES)}")
    rng = rng or np.random.default_rng(0)

    cost = np.asarray(FAMILIES[family](n, rng), dtype=np.float64)
    rows, cols = scipy.optimize.linear_sum_assignment(cost)
    try:
        u, v, _ = duals_from_matching_np(cost, rows, cols)
    except (AssertionError, RuntimeError):
        u, v = make_feasible_duals_np(cost)

    applied_noise = 0.0
    if dual_noise_prob > 0.0 and rng.random() < dual_noise_prob:
        applied_noise = noise_std
        u = u + rng.normal(0.0, noise_std, size=u.shape)
        v = v + rng.normal(0.0, noise_std, size=v.shape)
        u, v = project_feasible_np(cost, u, v, max_rounds=75)

    return SyntheticInstance(
        cost=cost,
        rows=rows.astype(np.int32),
        cols=cols.astype(np.int32),
        u=u.astype(np.float64),
        v=v.astype(np.float64),
        family=family,
        size=int(n),
        noise_std=float(applied_noise),
        tag=None,
    )
