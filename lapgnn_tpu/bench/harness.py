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
    """Time ``fn`` with warmups + repeats; returns stats dict in seconds."""
    try:
        for _ in range(warmups):
            out = fn()
            if block is not None:
                block(out)
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
            "std": float(arr.std()),
            "min": float(arr.min()),
            "max": float(arr.max()),
            "repeats": repeats,
            "result": out,
        }
    except Exception as exc:  # graceful degradation (timing.py:44-48)
        return {"success": False, "error": str(exc)}
