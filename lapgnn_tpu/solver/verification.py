"""Cross-solver agreement gate (``/root/reference/solvers/verification.py:12-45``).

All solvers must produce valid permutations with identical costs (within
tolerance) before any timing is trusted; run as a gate at benchmark start,
exactly as the reference does (main_benchmark.py:55-60).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["verify_solver_correctness"]


def _is_permutation(cols: np.ndarray, n: int) -> bool:
    return len(cols) == n and np.array_equal(np.sort(np.asarray(cols)), np.arange(n))


def verify_solver_correctness(
    C: np.ndarray,
    solvers: Optional[Sequence] = None,
    tol: float = 1e-10,
    u: Optional[np.ndarray] = None,
    v: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Solve ``C`` with every solver and assert cost agreement within ``tol``.

    Seeded solvers receive (u, v) if given (zeros otherwise — a zero seed must
    still be exactly optimal).  Returns {solver_name: cost}.
    """
    from .api import LAPSolver, SciPySolver, SeededLAPSolver

    if solvers is None:
        solvers = [SciPySolver(), LAPSolver(), SeededLAPSolver()]

    n = C.shape[0]
    costs: Dict[str, float] = {}
    for s in solvers:
        try:
            rows, cols, cost = s.solve(C, u=u, v=v)  # type: ignore[call-arg]
        except TypeError:
            rows, cols, cost = s.solve(C)
        if not _is_permutation(np.asarray(cols), n):
            raise AssertionError(f"{s.name}: result is not a permutation")
        recomputed = float(np.asarray(C)[np.asarray(rows), np.asarray(cols)].sum())
        if abs(recomputed - cost) > tol * max(1.0, abs(recomputed)):
            raise AssertionError(
                f"{s.name}: reported cost {cost} != recomputed {recomputed}"
            )
        costs[s.name] = cost

    ref = next(iter(costs.values()))
    for name, cost in costs.items():
        if abs(cost - ref) > tol * max(1.0, abs(ref)):
            raise AssertionError(f"solver disagreement: {costs}")
    return costs
