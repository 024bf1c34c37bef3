"""Cross-solver agreement gate (``/root/reference/solvers/verification.py:12-45``).

All solvers must produce valid permutations with identical costs (within
tolerance) before any timing is trusted; run as a gate at benchmark start,
exactly as the reference does (main_benchmark.py:55-60).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["verify_solver_correctness", "certify_assignment"]


def certify_assignment(
    C: np.ndarray,
    col_of_row: np.ndarray,
    v: np.ndarray,
    tol: float = 1e-6,
):
    """Float64 optimality certificate for a solver result.

    The f32 device solver's eps policy: it returns its final column duals v;
    with u_i = C[i, x_i] - v[x_i] the pair (u, v) is tight on the assignment
    by construction, so if the minimum reduced cost min_ij (C - u - v) is
    >= -tol, LP duality bounds the suboptimality by n * tol.  Evaluating the
    certificate in float64 on the host costs one O(n^2) pass — far cheaper
    than an f64 re-solve — and a failed certificate can be repaired by
    warm-starting the native f64 solver from the same duals (they are one
    augmentation path away from optimal in practice).

    The reference needs no such machinery because its solver is float64 end
    to end (lapjv.h:55); this is the TPU-native equivalent of that guarantee.

    Returns (certified: bool, max_violation: float, gap_bound: float).
    """
    C = np.asarray(C, np.float64)
    n = C.shape[-1]
    x = np.asarray(col_of_row)
    v = np.asarray(v, np.float64)
    u = C[np.arange(n), x] - v[x]
    min_red = float((C - u[:, None] - v[None, :]).min())
    violation = max(0.0, -min_red)
    return violation <= tol, violation, n * violation


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
