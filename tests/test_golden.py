"""Golden-value regression fixtures: seeded matrices with precomputed optima.

Mirrors the reference's fixture style (LAP/lap/tests/test_utils.py:101-132:
seeded generators with hard-coded optimal costs, e.g. 1k hard opt=101078, and
the cost_eps ill-conditioned golden file).  The optima below were computed
once with scipy.optimize.linear_sum_assignment and hard-coded; every solver
must reproduce them forever.
"""

import jax.numpy as jnp
import numpy as np
import pytest


def dense_int(n, seed, hi=100):
    rng = np.random.default_rng(seed)
    return rng.integers(1, hi, size=(n, n)).astype(np.float64)


def hard(n, seed):
    """Random ints plus row/column potentials (test_utils.py make_hard style)."""
    rng = np.random.default_rng(seed)
    C = rng.integers(0, 1000, size=(n, n)).astype(np.float64)
    C += rng.integers(0, 100, size=(n, 1))
    C += rng.integers(0, 100, size=(1, n))
    return C


def ill_conditioned(n, seed):
    """Integer base + sub-1e-9 jitter (cost_eps.csv.gz analogue)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 5, size=(n, n)).astype(np.float64)
    return base + rng.uniform(0, 1e-9, size=(n, n))


GOLDEN = [
    ("dense100", dense_int(100, 42), 216.0, 1e-9),
    ("dense1000", dense_int(1000, 7, hi=1000), 2193.0, 1e-9),
    ("hard200", hard(200, 3), 21016.0, 1e-9),
    # Ill-conditioned: optimum separated from alternatives only at the 1e-9
    # scale — float64 solvers must resolve it (reference golden tolerance
    # 1e-13 at its scale, test_lapjv.py:263-268).
    ("ill300", ill_conditioned(300, 11), 8.108544622276474e-09, 1e-12),
]


@pytest.mark.parametrize("name,C,opt,atol", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_native_matches_golden(name, C, opt, atol):
    from lapgnn_tpu.solver.native import lapjv_native

    _, _, cost = lapjv_native(C)
    assert abs(cost - opt) <= atol


@pytest.mark.parametrize(
    "name,C,opt,atol", GOLDEN[:3], ids=[g[0] for g in GOLDEN[:3]]
)
def test_jax_solver_matches_golden(name, C, opt, atol):
    from lapgnn_tpu.solver.jv import lapjv_single

    _, _, cost = lapjv_single(jnp.asarray(C))
    assert abs(float(cost) - opt) <= max(atol, 1e-9 * opt)


def test_jax_solver_ill_conditioned_f64():
    """The x64 device path must also resolve 1e-9-scale separations."""
    from lapgnn_tpu.solver.jv import lapjv_single

    name, C, opt, atol = GOLDEN[3]
    _, _, cost = lapjv_single(jnp.asarray(C, jnp.float64))
    assert abs(float(cost) - opt) <= 1e-12


@pytest.mark.parametrize(
    "name,C,opt,atol", GOLDEN[:3], ids=[g[0] for g in GOLDEN[:3]]
)
def test_seeded_solver_matches_golden(name, C, opt, atol):
    from lapgnn_tpu.ops.host_dual import oracle_duals_np
    from lapgnn_tpu.solver.native import lapjv_seeded_native

    u, v = oracle_duals_np(C)
    _, _, cost = lapjv_seeded_native(C, u, v)
    assert abs(cost - opt) <= atol


# --- Real-world ill-conditioned golden (reference: cost_eps.csv.gz, a real
# matrix whose optimum 224.8899507294651 is asserted at 1e-13,
# LAP/lap/tests/test_utils.py:126-132, test_lapjv.py:263-268).
#
# Ours is derived from the vendored OR-Library fixture (real assignment data,
# data/real/assignp200.assign.gz): coarse layer = the 200x200 integer costs
# (only 100 distinct values -> the coarse problem is massively degenerate,
# with many optimal assignments), fine layer = the same real data
# rotated 180 degrees, scaled by 2^-26.  The optimum is therefore decided
# entirely by 1.5e-8-scale tie-breaking among the coarse-optimal
# assignments — exactly the cost_eps failure mode (near-ties far below the
# value scale).  The golden optimum was computed INDEPENDENTLY in exact
# integer arithmetic: opt_int = lsa(A * 2^26 + B) = 17918076112 (entries
# < 2^33 and the 200-term sum < 2^35 are exact in f64), so
# GOLDEN = opt_int * 2^-26 is the true optimum to the last bit and every
# f64 solver must hit it to 1e-13.
ILL_REAL_OPT = 17918076112 / (1 << 26)  # 267.0001404285431


def _ill_real_matrix():
    from pathlib import Path

    from lapgnn_tpu.data.processors import parse_orlib_assign

    fixture = (
        Path(__file__).resolve().parent.parent
        / "data"
        / "real"
        / "assignp200.assign.gz"
    )
    A = np.asarray(parse_orlib_assign(fixture).cost, np.float64)
    return A + A[::-1, ::-1] * 2.0**-26


def test_ill_conditioned_real_golden_native():
    from lapgnn_tpu.solver.native import lapjv_native

    C = _ill_real_matrix()
    _, _, cost = lapjv_native(C)
    assert abs(cost - ILL_REAL_OPT) <= 1e-13


def test_ill_conditioned_real_golden_seeded_native():
    from lapgnn_tpu.ops.host_dual import oracle_duals_np
    from lapgnn_tpu.solver.native import lapjv_seeded_native

    C = _ill_real_matrix()
    u, v = oracle_duals_np(C)
    _, _, cost = lapjv_seeded_native(C, u, v)
    assert abs(cost - ILL_REAL_OPT) <= 1e-13


def test_ill_conditioned_real_golden_py_sparse():
    from lapgnn_tpu.solver.py_sparse import lapmod_py

    C = _ill_real_matrix()
    n = C.shape[0]
    row_ptr = np.arange(0, n * n + 1, n, dtype=np.int64)
    col_idx = np.tile(np.arange(n, dtype=np.int64), n)
    x, _, cost = lapmod_py(n, row_ptr, col_idx, C.ravel())
    assert abs(C[np.arange(n), x].sum() - ILL_REAL_OPT) <= 1e-13
    assert abs(cost - ILL_REAL_OPT) <= 1e-13


def test_ill_conditioned_real_golden_jax_f64():
    from lapgnn_tpu.solver.jv import lapjv_single

    C = _ill_real_matrix()
    _, _, cost = lapjv_single(jnp.asarray(C, jnp.float64))
    assert abs(float(cost) - ILL_REAL_OPT) <= 1e-13
