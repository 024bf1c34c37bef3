"""Cold JAX JV solver tests: exact optimality vs SciPy across families."""

import jax
import jax.numpy as jnp
import zlib

import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.generators import (
    FAMILIES,
    generate_identity_like_costs,
    generate_worst_case_costs,
)
from lapgnn_tpu.solver.jv import column_reduction, lapjv_batch, lapjv_single

_solve = jax.jit(lapjv_single)


def _check_optimal(C, atol=1e-9):
    n = C.shape[0]
    r, c = scipy.optimize.linear_sum_assignment(C)
    opt = C[r, c].sum()
    x, y, cost = _solve(jnp.asarray(C))
    x, y = np.asarray(x), np.asarray(y)
    assert sorted(x.tolist()) == list(range(n)), "x must be a permutation"
    assert np.array_equal(x[y], np.arange(n)), "x and y must be inverse"
    assert abs(float(cost) - opt) <= atol * max(1.0, abs(opt)), (float(cost), opt)
    return float(cost)


@pytest.mark.parametrize("fam", sorted(FAMILIES))
@pytest.mark.parametrize("n", [4, 33, 128])
def test_cold_jv_optimal(fam, n):
    rng = np.random.default_rng(zlib.crc32(f"{fam}:{n}".encode()))
    _check_optimal(FAMILIES[fam](n, rng))


def test_known_optimum_identity():
    C = generate_identity_like_costs(12)
    x, y, cost = _solve(jnp.asarray(C))
    assert float(cost) == 0.0
    np.testing.assert_array_equal(np.asarray(x), np.arange(12))


def test_known_optimum_worst_case():
    C = generate_worst_case_costs(16)
    _check_optimal(C)


def test_hand_computed_3x3():
    # Optimal assignment (0,1), (1,0), (2,2) with cost 1+2+2 = 5.
    C = np.array([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    x, y, cost = _solve(jnp.asarray(C))
    assert float(cost) == 5.0


def test_degenerate_all_equal():
    C = np.ones((9, 9))
    cost = _check_optimal(C)
    assert cost == 9.0


def test_column_reduction_invariants(rng):
    C = FAMILIES["uniform"](32, rng)
    m = column_reduction(jnp.asarray(C))
    x = np.asarray(m.col_of_row)
    y = np.asarray(m.row_of_col)
    v = np.asarray(m.v)
    # Partial matching consistency.
    for i, j in enumerate(x):
        if j >= 0:
            assert y[j] == i
    # Dual feasibility with implicit u_i = min_j (C_ij - v_j).
    u = (C - v[None, :]).min(axis=1)
    assert (C - u[:, None] - v[None, :]).min() >= -1e-10


def test_affine_invariance():
    """cost(aC + b) == a*cost(C) + b*n (advanced_dual.py:128-160)."""
    rng = np.random.default_rng(11)
    C = FAMILIES["uniform"](24, rng)
    _, _, cost0 = _solve(jnp.asarray(C))
    a, b = 3.7, -1.2
    _, _, cost1 = _solve(jnp.asarray(a * C + b))
    assert abs(float(cost1) - (a * float(cost0) + b * 24)) < 1e-8


def test_batch_matches_single(rng):
    Cs = np.stack([FAMILIES["uniform"](20, rng) for _ in range(4)])
    xb, yb, costb = lapjv_batch(jnp.asarray(Cs))
    for b in range(4):
        _, _, cost = _solve(jnp.asarray(Cs[b]))
        assert abs(float(costb[b]) - float(cost)) < 1e-10


def test_float32_optimality_uniform():
    """The TPU precision path should still be exactly optimal on well-
    separated uniform instances."""
    rng = np.random.default_rng(5)
    C = FAMILIES["uniform"](64, rng)
    r, c = scipy.optimize.linear_sum_assignment(C)
    x, _, cost = _solve(jnp.asarray(C, jnp.float32))
    assert abs(float(cost) - C[r, c].sum()) < 1e-4
