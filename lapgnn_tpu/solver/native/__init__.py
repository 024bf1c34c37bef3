"""ctypes bindings for the native lapx solver.

Replaces the reference's Cython binding layer
(``/root/reference/LAP/lap/_lapjv.pyx`` / ``_seeded_jv.pyx``) with a zero-
dependency ctypes wrapper around a shared library compiled on first import
(g++ -O3; cached next to the source keyed by a content hash).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["lapjv_native", "lapjv_seeded_native", "lapmod_native", "repair_duals_native", "sparse_from_dense", "native_available", "NativeSolveError"]

_SRC = Path(__file__).with_name("lapx.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LOAD_ERROR: Optional[str] = None


class NativeSolveError(RuntimeError):
    pass


def _build_and_load() -> ctypes.CDLL:
    src = _SRC.read_text()
    # Cache key = source hash + host architecture: the build uses
    # -march=native, so a shared home dir across heterogeneous machines
    # must not serve one machine's AVX-512 binary to another (SIGILL).
    import platform

    host = f"{platform.machine()}-{platform.processor() or 'cpu'}"
    tag = hashlib.sha256((src + host).encode()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("LAPGNN_NATIVE_CACHE", Path.home() / ".cache" / "lapgnn_tpu")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    so = cache_dir / f"liblapx_{tag}.so"
    if not so.exists():
        # PID-unique temp + atomic rename: concurrent cold-start processes
        # (pytest-xdist, multi-process loaders) must not write through the
        # same path and publish a half-written ELF under the cached name.
        tmp = so.with_suffix(f".so.tmp.{os.getpid()}")
        cmd = [
            "g++",
            "-O3",
            "-march=native",
            "-std=c++17",
            "-shared",
            "-fPIC",
            str(_SRC),
            "-o",
            str(tmp),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        tmp.replace(so)
    lib = ctypes.CDLL(str(so))

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.lapx_dense.restype = ctypes.c_int
    lib.lapx_dense.argtypes = [ctypes.c_int, f64p, i32p, i32p, f64p, f64p]
    lib.lapx_seeded.restype = ctypes.c_int
    lib.lapx_seeded.argtypes = [
        ctypes.c_int,
        f64p,
        f64p,
        f64p,
        ctypes.c_double,
        i32p,
        i32p,
        i32p,
        f64p,
        f64p,
        ctypes.c_int,
    ]
    return lib


def _lib() -> ctypes.CDLL:
    global _LIB, _LOAD_ERROR
    if _LIB is None:
        with _LOCK:
            if _LOAD_ERROR is not None:
                # Fail fast: don't spawn a fresh (doomed) compiler subprocess
                # on every call after the first failure.
                raise NativeSolveError(f"native build failed: {_LOAD_ERROR}")
            if _LIB is None:
                try:
                    _LIB = _build_and_load()
                except Exception as exc:  # pragma: no cover - toolchain issues
                    _LOAD_ERROR = str(exc)
                    raise NativeSolveError(f"native build failed: {exc}") from exc
    return _LIB


def native_available() -> bool:
    try:
        _lib()
        return True
    except NativeSolveError:
        return False


def lapjv_native(
    C: np.ndarray, return_duals: bool = False
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Cold optimal solve. Returns (col_of_row, row_of_col, cost[, u, v])."""
    C = np.ascontiguousarray(C, dtype=np.float64)
    n = C.shape[0]
    if C.shape != (n, n):
        raise ValueError("lapjv_native expects a square matrix")
    x = np.empty(n, np.int32)
    y = np.empty(n, np.int32)
    u = np.empty(n, np.float64)
    v = np.empty(n, np.float64)
    rc = _lib().lapx_dense(n, C, x, y, u, v)
    if rc != 0:
        raise NativeSolveError(f"lapx_dense failed with code {rc}")
    cost = float(C[np.arange(n), x].sum())
    if return_duals:
        return x, y, cost, u, v
    return x, y, cost


_GATES = {"density": 0, "free_rows": 1, "never": 2, "both": 3}


def lapjv_seeded_native(
    C: np.ndarray,
    u_seed: np.ndarray,
    v_seed: np.ndarray,
    eps: float = 1e-12,
    return_info: bool = False,
    gate: str = "density",
):
    """Warm-started solve. Returns (col_of_row, row_of_col, cost[, info]).

    ``gate`` selects the cold-fallback criterion (mirrors the device solver):
    "density" (reference 1.2n rule), "free_rows" (> half the rows unmatched
    after the greedy phase), "both" (cold only when BOTH heuristics deem the
    seed bad — the production default across the pipeline), "never".
    """
    C = np.ascontiguousarray(C, dtype=np.float64)
    n = C.shape[0]
    if C.shape != (n, n):
        raise ValueError("lapjv_seeded_native expects a square matrix")
    u_seed = np.ascontiguousarray(u_seed, dtype=np.float64)
    v_seed = np.ascontiguousarray(v_seed, dtype=np.float64)
    if u_seed.shape != (n,) or v_seed.shape != (n,):
        # ndpointer checks dtype/contiguity only; a short seed would be an
        # out-of-bounds READ in the C++ (garbage duals or a segfault).
        raise ValueError(
            f"seed shapes {u_seed.shape}/{v_seed.shape} must be ({n},)"
        )
    x = np.empty(n, np.int32)
    y = np.empty(n, np.int32)
    fb = np.zeros(1, np.int32)
    u = np.empty(n, np.float64)
    v = np.empty(n, np.float64)
    rc = _lib().lapx_seeded(
        n, C, u_seed, v_seed, float(eps), x, y, fb, u, v, _GATES[gate]
    )
    if rc != 0:
        raise NativeSolveError(f"lapx_seeded failed with code {rc}")
    cost = float(C[np.arange(n), x].sum())
    if return_info:
        return x, y, cost, {"used_fallback": bool(fb[0]), "u": u, "v": v}
    return x, y, cost


def _bind_repair(lib: "ctypes.CDLL") -> None:
    if getattr(lib, "_repair_bound", False):
        return
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.lapx_repair_duals.restype = ctypes.c_int
    lib.lapx_repair_duals.argtypes = [
        ctypes.c_int, f64p, i32p, f64p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib._repair_bound = True


def repair_duals_native(
    C: np.ndarray,
    col_of_row: np.ndarray,
    v0: np.ndarray,
    max_scans: int = 0,
) -> Optional[Tuple[np.ndarray, float]]:
    """Warm-started exact dual repair for a candidate optimal assignment.

    Drives ``v0`` to the min-plus fixpoint of the difference constraints the
    assignment induces on the TRUE matrix ``C`` (heap-ordered label
    correcting in C++ — see lapx.cpp::lapx_repair_duals).  On success returns
    ``(v, min_red)`` where ``u_i = C[i, x_i] - v[x_i]`` makes (u, v) tight on
    the assignment by construction, so ``min_red >= -tol`` certifies the
    assignment ``tol``-optimal with ZERO complementary-slackness gap.

    Returns ``None`` when the relaxation budget blows up — the signature of
    a suboptimal assignment (its constraint graph has a negative cycle), in
    which case the caller should re-solve.  Raises on malformed inputs.

    The reference's cold equivalent is dual_computation.py:13-74 (Python
    Bellman-Ford at dataset-generation time); this one is warm-started and
    fast enough (~2 dense passes) to run per-instance in the serving path.
    """
    lib = _lib()
    _bind_repair(lib)
    C = np.ascontiguousarray(C, np.float64)
    n = C.shape[0]
    if C.shape != (n, n):
        raise ValueError("repair_duals_native expects a square matrix")
    x = np.ascontiguousarray(col_of_row, np.int32)
    v = np.array(v0, np.float64, copy=True, order="C")
    if x.shape != (n,) or v.shape != (n,):
        raise ValueError(f"x/v shapes {x.shape}/{v.shape} must be ({n},)")
    min_red = ctypes.c_double(float("nan"))
    rc = lib.lapx_repair_duals(
        n, C, x, v, int(max_scans), ctypes.byref(min_red)
    )
    if rc == -1:
        return None
    if rc != 0:
        raise NativeSolveError(f"lapx_repair_duals failed with code {rc}")
    return v, float(min_red.value)


def _bind_sparse(lib: "ctypes.CDLL") -> None:
    if getattr(lib, "_sparse_bound", False):
        return
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.lapx_sparse.restype = ctypes.c_int
    lib.lapx_sparse.argtypes = [
        ctypes.c_int, i32p, i32p, f64p, i32p, i32p, f64p, f64p, ctypes.c_int,
    ]
    lib._sparse_bound = True


def lapmod_native(
    n: int,
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    values: np.ndarray,
    return_duals: bool = False,
    fp_version: int = 3,
):
    """Sparse CSR solve (LAPMOD capability: reference LAP/_lapjv_cpp/lapmod.cpp).

    Args mirror lap.lapmod's CSR triplet (row_ptr has n+1 entries).
    ``fp_version``: 1 = dense-scan find-path, 2 = frontier-list find-path,
    3 = dynamic dispatch at the 25% density threshold (lapmod.cpp:559-585).
    Raises NativeSolveError(-3) if the allowed edges admit no perfect
    matching.  Returns (col_of_row, row_of_col, cost[, u, v]).
    """
    lib = _lib()
    _bind_sparse(lib)
    row_ptr = np.ascontiguousarray(row_ptr, np.int32)
    col_idx = np.ascontiguousarray(col_idx, np.int32)
    values = np.ascontiguousarray(values, np.float64)
    if row_ptr.shape[0] != n + 1:
        raise ValueError("row_ptr must have n+1 entries")
    # Full CSR validation before handing raw pointers to C++: an index
    # outside [0, n) or a row_ptr overrunning the buffers would be an
    # out-of-bounds heap WRITE (v[j]/y[j]) — process corruption, not a
    # Python exception.
    nnz = int(row_ptr[-1])
    if np.any(np.diff(row_ptr) < 0) or int(row_ptr[0]) != 0:
        raise ValueError("row_ptr must be nondecreasing and start at 0")
    if col_idx.shape[0] < nnz or values.shape[0] < nnz:
        raise ValueError(
            f"col_idx/values need at least row_ptr[n]={nnz} entries "
            f"(got {col_idx.shape[0]}/{values.shape[0]})"
        )
    if nnz and (col_idx[:nnz].min() < 0 or col_idx[:nnz].max() >= n):
        raise ValueError("col_idx entries must be in [0, n)")
    x = np.empty(n, np.int32)
    y = np.empty(n, np.int32)
    u = np.empty(n, np.float64)
    v = np.empty(n, np.float64)
    rc = lib.lapx_sparse(
        n, row_ptr, col_idx, values, x, y, u, v, int(fp_version)
    )
    if rc != 0:
        raise NativeSolveError(f"lapx_sparse failed with code {rc}"
                               + (" (infeasible)" if rc == -3 else ""))
    # Cost from CSR entries of the matched edges.
    cost = 0.0
    for i in range(n):
        seg = slice(row_ptr[i], row_ptr[i + 1])
        k = np.nonzero(col_idx[seg] == x[i])[0]
        cost += float(values[seg][k[0]])
    if return_duals:
        return x, y, cost, u, v
    return x, y, cost


def sparse_from_dense(
    C: np.ndarray, forbidden_threshold: float = 1e6
):
    """Dense -> CSR dropping entries >= threshold (lapmod_solver.py:47-69)."""
    C = np.asarray(C, np.float64)
    n = C.shape[0]
    keep = np.isfinite(C) & (C < forbidden_threshold)
    counts = keep.sum(axis=1).astype(np.int32)
    row_ptr = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=row_ptr[1:])
    col_idx = np.nonzero(keep)[1].astype(np.int32)
    values = C[keep].astype(np.float64)
    return row_ptr, col_idx, values
