"""Drop-in compatibility API for the reference's ``lap`` package.

Re-creates the user-facing surface of ``/root/reference/LAP/lap/__init__.py``
and the binding semantics of ``_lapjv.pyx:38-158`` on the lapx native
backend:

  * ``lapjv(cost, extend_cost=False, cost_limit=inf, return_cost=True)``
    with non-square extension (zero padding to max(n, m), _lapjv.pyx:91-95)
    and the cost-limit doubling trick (an (n_rows+n_cols)^2 matrix filled
    with cost_limit/2 and a zero bottom-right block, _lapjv.pyx:84-90);
    unmatched rows/columns are reported as -1 (_lapjv.pyx:116-120).
  * ``lapmod(n, cc, ii, kk)`` — CSR sparse solve (lap/lapmod.py:273-340).
  * ``lapjv_seeded(cost, u, v, eps)`` — warm-started solve
    (lap/_seeded_jv.pyx:14-31).
  * ``LARGE`` and the ``FP_*`` constants (lapjv.h:4,57); ``fp_version``
    selects the find-path strategy as in the reference — FP_1 dense scans,
    FP_2 frontier list, FP_DYNAMIC dispatch at the 25% density threshold
    (lapmod.cpp:559-585).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["lapjv", "lapmod", "lapjv_seeded", "LARGE", "FP_1", "FP_2", "FP_DYNAMIC"]

# Sentinel cost used by the reference for forbidden sparse entries (lapjv.h:4).
LARGE = 1000000

# Find-path strategy flags (lapjv.h:57).
FP_1 = 1
FP_2 = 2
FP_DYNAMIC = 3


def lapjv(
    cost: np.ndarray,
    extend_cost: bool = False,
    cost_limit: float = np.inf,
    return_cost: bool = True,
):
    """Solve a dense LAP with the reference ``lap.lapjv`` call signature.

    Returns (opt, x, y) (or (x, y) when ``return_cost`` is False); x maps
    rows to columns, y columns to rows, -1 marks unmatched entries under
    ``extend_cost``/``cost_limit``.
    """
    from .native import lapjv_native

    C = np.ascontiguousarray(cost, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError("2-dimensional array expected")
    n_rows, n_cols = C.shape
    if n_rows != n_cols and not extend_cost:
        # The reference raises for ANY non-square input without extend_cost,
        # cost_limit or not (_lapjv.pyx:80-84) — a finite cost_limit must not
        # paper over a caller's shape bug.
        raise ValueError(
            "Square cost array expected. If cost is intentionally non-square, "
            "pass extend_cost=True."
        )

    if np.isfinite(cost_limit):
        n = n_rows + n_cols
        Ce = np.full((n, n), cost_limit / 2.0, dtype=np.float64)
        Ce[n_rows:, n_cols:] = 0.0
        Ce[:n_rows, :n_cols] = C
    elif n_rows != n_cols:
        n = max(n_rows, n_cols)
        Ce = np.zeros((n, n), dtype=np.float64)
        Ce[:n_rows, :n_cols] = C
    else:
        n = n_rows
        Ce = C

    x, y, _ = lapjv_native(Ce)
    x = np.asarray(x, np.int32)
    y = np.asarray(y, np.int32)

    if np.isfinite(cost_limit) or n_rows != n_cols:
        x = x.copy()
        y = y.copy()
        x[x >= n_cols] = -1
        y[y >= n_rows] = -1
        x = x[:n_rows]
        y = y[:n_cols]
        opt = float(C[np.nonzero(x != -1)[0], x[x != -1]].sum())
    else:
        opt = float(C[np.arange(n_rows), x].sum())

    if return_cost:
        return opt, x, y
    return x, y


def lapmod(
    n: int,
    cc: np.ndarray,
    ii: np.ndarray,
    kk: np.ndarray,
    fast: bool = True,
    return_cost: bool = True,
    fp_version: int = FP_DYNAMIC,
):
    """Sparse CSR solve with the reference ``lap.lapmod`` call signature.

    ``cc``: flattened costs, ``ii``: row pointers (n+1), ``kk``: column
    indices.  Costs must be < LARGE and non-negative (lap/lapmod.py:248-259).
    """
    from .native import lapmod_native

    cc = np.ascontiguousarray(cc, np.float64)
    ii = np.ascontiguousarray(ii, np.int64)
    kk = np.ascontiguousarray(kk, np.int64)
    if n <= 0:
        raise ValueError("n must be positive (lap/lapmod.py:249)")
    if ii.shape[0] != n + 1:
        raise ValueError("ii must have n+1 entries")
    if kk.shape[0] == 0 or int(ii[-1]) == 0:
        raise ValueError("empty sparse cost (no allowed edges)")
    if np.any(cc < 0):
        raise ValueError("negative costs are not supported")
    if np.any(cc >= LARGE):
        raise ValueError(f"costs must be below LARGE={LARGE}")

    x, y, cost = lapmod_native(int(n), ii, kk, cc, fp_version=int(fp_version))
    if return_cost:
        return cost, np.asarray(x, np.int32), np.asarray(y, np.int32)
    return np.asarray(x, np.int32), np.asarray(y, np.int32)


def lapjv_seeded(
    cost: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    eps: float = 1e-12,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Warm-started solve with the reference ``lap.lapjv_seeded`` signature.

    Returns (x, y, cost).  Note: the reference raises ValueError when the
    seed remains infeasible after its one-shot projection
    (_seeded_jv.pyx:26-29); this implementation's monotone cap projection
    always reaches feasibility, so no such failure mode exists.
    """
    from .native import lapjv_seeded_native

    C = np.ascontiguousarray(cost, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError("2-dimensional cost matrix expected")
    n_rows, n_cols = C.shape
    u = np.ascontiguousarray(u, np.float64)
    v = np.ascontiguousarray(v, np.float64)
    if u.shape[0] != n_rows or v.shape[0] != n_cols:
        raise ValueError("seed lengths must match the cost shape")
    if n_rows == n_cols:
        x, y, total = lapjv_seeded_native(C, u, v, eps=eps)
        return np.asarray(x, np.int32), np.asarray(y, np.int32), float(total)
    # Rectangular (reference _seeded_jv.pyx accepts (n_rows, n_cols)):
    # zero-pad to square — dummy rows/cols cost 0, so the square optimum
    # restricted to real rows is the rectangular optimum; seeds are padded
    # with zeros (seed quality only affects speed, never exactness).
    m = max(n_rows, n_cols)
    Ce = np.zeros((m, m), np.float64)
    Ce[:n_rows, :n_cols] = C
    ue = np.zeros(m, np.float64)
    ue[:n_rows] = u
    ve = np.zeros(m, np.float64)
    ve[:n_cols] = v
    xe, ye, _ = lapjv_seeded_native(Ce, ue, ve, eps=eps)
    x = xe[:n_rows].astype(np.int32)
    x[x >= n_cols] = -1
    y = ye[:n_cols].astype(np.int32)
    y[y >= n_rows] = -1
    mask = x >= 0
    total = float(C[np.nonzero(mask)[0], x[mask]].sum())
    return x, y, total
