"""Rigorous wall-clock timing harness.

Methodology identical to the reference (``/root/reference/solvers/timing.py:
13-58``): N warmup runs discarded, R measured repeats, median/mean/std/min/max
reported; failures return {'success': False} instead of raising.  For JAX
callables the caller must ensure the function blocks until ready (pass
``block=...``), since dispatch is asynchronous.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import numpy as np

__all__ = ["time_rigorous"]


def time_rigorous(
    fn: Callable[[], Any],
    warmups: int = 5,
    repeats: int = 30,
    block: Optional[Callable[[Any], Any]] = None,
) -> Dict[str, Any]:
    """Time ``fn`` with warmups + repeats; returns stats dict in seconds.

    Warmup exceptions are swallowed (the reference does the same,
    timing.py:30-34 — a lazy one-time init may fail once and then work);
    failures during the TIMED repeats mark the measurement unsuccessful.
    """
    if repeats < 1:
        raise ValueError("repeats must be >= 1")
    for _ in range(warmups):
        try:
            out = fn()
            if block is not None:
                block(out)
        except Exception:
            pass
    try:
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn()
            if block is not None:
                block(out)
            times.append(time.perf_counter() - t0)
        arr = np.asarray(times)
        return {
            "success": True,
            "median": float(np.median(arr)),
            "mean": float(arr.mean()),
            # sample std (ddof=1) to match the reference's statistics.stdev
            "std": float(arr.std(ddof=1)) if len(arr) > 1 else 0.0,
            "min": float(arr.min()),
            "max": float(arr.max()),
            "repeats": repeats,
            "result": out,
        }
    except Exception as exc:  # graceful degradation (timing.py:44-48)
        return {"success": False, "error": str(exc)}
