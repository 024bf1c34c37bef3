"""lap-package compatibility API tests (mirrors LAP/lap/tests style)."""

import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.ops.host_dual import oracle_duals_np
from lapgnn_tpu.solver import lap_compat as lap


def test_square_lapjv_matches_scipy(rng):
    C = FAMILIES["uniform"](30, rng)
    r, c = scipy.optimize.linear_sum_assignment(C)
    opt, x, y = lap.lapjv(C)
    assert abs(opt - C[r, c].sum()) < 1e-10
    assert np.array_equal(x[y], np.arange(30))


def test_hand_computed_square():
    # Same style as LAP/lap/tests/test_lapjv.py hand cases.
    C = np.array([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    opt, x, y = lap.lapjv(C)
    assert opt == 5.0
    assert x.tolist() == [1, 0, 2]


def test_non_square_requires_extend():
    C = np.ones((3, 5))
    with pytest.raises(ValueError):
        lap.lapjv(C)


def test_extend_cost_wide():
    """4x5: every row matched, one column unmatched (test_lapjv.py:34-57 style)."""
    rng = np.random.default_rng(0)
    C = rng.uniform(1, 2, (4, 5))
    opt, x, y = lap.lapjv(C, extend_cost=True)
    assert x.shape == (4,) and y.shape == (5,)
    assert (x >= 0).all(), "all rows matched in a wide problem"
    assert (y == -1).sum() == 1
    r, c = scipy.optimize.linear_sum_assignment(C)
    assert abs(opt - C[r, c].sum()) < 1e-10


def test_extend_cost_tall():
    rng = np.random.default_rng(1)
    C = rng.uniform(1, 2, (5, 3))
    opt, x, y = lap.lapjv(C, extend_cost=True)
    assert (x == -1).sum() == 2, "two rows unmatched in a tall problem"
    assert (y >= 0).all()


def test_cost_limit_drops_expensive_assignments():
    # With a low cost limit, expensive rows stay unmatched.
    C = np.array([[1.0, 10.0], [10.0, 10.0]])
    opt, x, y = lap.lapjv(C, cost_limit=5.0)
    assert x[0] == 0 and x[1] == -1
    assert opt == 1.0


def test_cost_limit_high_equals_plain():
    rng = np.random.default_rng(2)
    C = FAMILIES["uniform"](12, rng)
    opt_plain, x_plain, _ = lap.lapjv(C)
    opt_lim, x_lim, _ = lap.lapjv(C, cost_limit=1e9)
    assert abs(opt_plain - opt_lim) < 1e-9
    assert (x_lim >= 0).all()


def test_return_cost_false():
    C = np.eye(4)
    out = lap.lapjv(C, return_cost=False)
    assert len(out) == 2


def test_lapmod_csr_matches_dense():
    rng = np.random.default_rng(3)
    C = FAMILIES["uniform"](25, rng)
    from lapgnn_tpu.solver.native import sparse_from_dense

    ii, kk, cc = sparse_from_dense(C)
    cost, x, y = lap.lapmod(25, cc, ii, kk)
    opt, x2, _ = lap.lapjv(C)
    assert abs(cost - opt) < 1e-10


def test_lapmod_rejects_bad_costs():
    with pytest.raises(ValueError):
        lap.lapmod(2, np.array([-1.0, 1.0]), np.array([0, 1, 2]), np.array([0, 1]))
    with pytest.raises(ValueError):
        lap.lapmod(2, np.array([lap.LARGE + 1.0, 1.0]), np.array([0, 1, 2]), np.array([0, 1]))


def test_lapjv_seeded_zero_seed(rng):
    """Zero seed == cold solve (LAP/test_seeded.py:6-47 equivalence)."""
    C = FAMILIES["uniform"](20, rng)
    x, y, cost = lap.lapjv_seeded(C, np.zeros(20), np.zeros(20))
    opt, x2, _ = lap.lapjv(C)
    assert abs(cost - opt) < 1e-10


def test_lapjv_seeded_oracle(rng):
    C = FAMILIES["uniform"](24, rng)
    u, v = oracle_duals_np(C)
    x, y, cost = lap.lapjv_seeded(C, u, v)
    opt, _, _ = lap.lapjv(C)
    assert abs(cost - opt) < 1e-10


def test_constants_exported():
    assert lap.LARGE == 1000000
    assert lap.FP_DYNAMIC != lap.FP_1


def test_pure_python_sparse_spec_matches_all_backends(rng):
    """Three-way agreement: pure-NumPy spec vs native CSR vs dense SciPy."""
    from lapgnn_tpu.solver.native import lapmod_native, sparse_from_dense
    from lapgnn_tpu.solver.py_sparse import lapmod_py

    C = FAMILIES["uniform"](30, rng)
    ii, kk, cc = sparse_from_dense(C)
    x_py, y_py, cost_py = lapmod_py(30, ii, kk, cc)
    x_na, y_na, cost_na = lapmod_native(30, ii, kk, cc)
    r, c = scipy.optimize.linear_sum_assignment(C)
    assert abs(cost_py - C[r, c].sum()) < 1e-10
    assert abs(cost_na - cost_py) < 1e-10
    assert sorted(x_py.tolist()) == list(range(30))


def test_pure_python_sparse_infeasible():
    from lapgnn_tpu.solver.py_sparse import lapmod_py

    with pytest.raises(ValueError):
        lapmod_py(2, np.array([0, 1, 2]), np.array([0, 0]), np.array([1.0, 2.0]))


def test_pure_python_check_cost():
    from lapgnn_tpu.solver.py_sparse import check_cost

    with pytest.raises(ValueError):
        check_cost(np.array([-1.0]))
    with pytest.raises(ValueError):
        check_cost(np.array([2e6]))


def test_lapjv_nonsquare_with_cost_limit_raises():
    """Reference raises for ANY non-square input without extend_cost
    (_lapjv.pyx:80-84); a finite cost_limit must not bypass the check."""
    with pytest.raises(ValueError):
        lap.lapjv(np.ones((3, 5)), cost_limit=2.0)


def test_lapmod_rejects_empty():
    with pytest.raises(ValueError):
        lap.lapmod(0, np.array([]), np.array([0]), np.array([]))
    with pytest.raises(ValueError):
        lap.lapmod(2, np.array([]), np.array([0, 0, 0]), np.array([]))


def test_lapjv_seeded_rectangular():
    """Reference lap.lapjv_seeded accepts (n_rows, n_cols); verify the
    rectangular optimum against SciPy with -1 for unmatched columns."""
    rng = np.random.default_rng(3)
    C = rng.uniform(0, 1, (4, 7))
    x, y, total = lap.lapjv_seeded(C, np.zeros(4), C.min(axis=0))
    r, c = scipy.optimize.linear_sum_assignment(C)
    assert total == pytest.approx(C[r, c].sum(), rel=1e-9)
    assert (x >= 0).all() and len(set(x.tolist())) == 4
    assert (y == -1).sum() == 3  # 3 unmatched columns
    for j, i in enumerate(y):
        if i >= 0:
            assert x[i] == j
