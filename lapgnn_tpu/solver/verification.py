"""Cross-solver agreement gate (``/root/reference/solvers/verification.py:12-45``).

All solvers must produce valid permutations with identical costs (within
tolerance) before any timing is trusted; run as a gate at benchmark start,
exactly as the reference does (main_benchmark.py:55-60).
"""

from __future__ import annotations

import inspect
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

    The LP-duality bound's premise is that ``col_of_row`` is a bijection and
    every quantity is finite, so both are checked: a duplicate-column
    "matching" or a NaN-poisoned solve must FAIL the certificate (Python's
    ``max(0.0, nan)`` would otherwise return 0.0 and certify garbage).

    The reference needs no such machinery because its solver is float64 end
    to end (lapjv.h:55); this is the TPU-native equivalent of that guarantee.

    Returns (certified: bool, max_violation: float, gap_bound: float).
    """
    C = np.asarray(C, np.float64)
    n = C.shape[-1]
    x = np.asarray(col_of_row)
    v = np.asarray(v, np.float64)
    if not _is_permutation(x, n):
        return False, float("inf"), float("inf")
    u = C[np.arange(n), x] - v[x]
    min_red = float((C - u[:, None] - v[None, :]).min())
    if not np.isfinite(min_red):
        return False, float("inf"), float("inf")
    violation = max(0.0, -min_red)
    return violation <= tol, violation, n * violation


def _is_permutation(cols: np.ndarray, n: int) -> bool:
    cols = np.asarray(cols)
    return len(cols) == n and np.array_equal(np.sort(cols), np.arange(n))


def _accepts_seed(solve_fn) -> bool:
    """Does the solver's solve() accept (u, v) kwargs?  Decided by signature,
    NOT by catching TypeError from the call — a TypeError raised *inside* a
    seeded solver would otherwise silently retry unseeded, masking the bug
    and skipping the code path under test."""
    try:
        params = inspect.signature(solve_fn).parameters
    except (TypeError, ValueError):
        return False
    if any(p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return True
    return "u" in params and "v" in params


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

    The comparisons are written NaN-hostile (``not (x <= tol)`` instead of
    ``x > tol``): a solver returning NaN — or a NaN entry in ``C`` making the
    recomputed cost NaN — must fail the gate, not sail through because every
    ``>`` comparison with NaN is False.
    """
    from .api import LAPSolver, SciPySolver, SeededLAPSolver

    if solvers is None:
        solvers = [SciPySolver(), LAPSolver(), SeededLAPSolver()]

    n = C.shape[0]
    costs: Dict[str, float] = {}
    ref: Optional[float] = None
    for s in solvers:
        if _accepts_seed(s.solve):
            rows, cols, cost = s.solve(C, u=u, v=v)
        else:
            rows, cols, cost = s.solve(C)
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        if not _is_permutation(cols, n) or not _is_permutation(rows, n):
            raise AssertionError(f"{s.name}: result is not a permutation")
        recomputed = float(np.asarray(C)[rows, cols].sum())
        if not (abs(recomputed - cost) <= tol * max(1.0, abs(recomputed))):
            raise AssertionError(
                f"{s.name}: reported cost {cost} != recomputed {recomputed}"
            )
        if ref is None:
            ref = float(cost)
        # Compare against the FIRST solver here, not via a name-keyed dict
        # after the loop: two solvers sharing a name would silently
        # overwrite each other and escape the agreement check.
        if not (abs(float(cost) - ref) <= tol * max(1.0, abs(ref))):
            raise AssertionError(
                f"solver disagreement: {s.name}={cost} vs reference={ref}"
            )
        costs[s.name] = float(cost)
    return costs
