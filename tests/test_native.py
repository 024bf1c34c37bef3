"""Native C++ lapx solver tests (the float64 host oracle)."""

import zlib

import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.ops.host_dual import oracle_duals_np

native = pytest.importorskip("lapgnn_tpu.solver.native")

if not native.native_available():  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def _opt(C):
    r, c = scipy.optimize.linear_sum_assignment(C)
    return C[r, c].sum()


@pytest.mark.parametrize("fam", sorted(FAMILIES))
@pytest.mark.parametrize("n", [5, 64, 200])
def test_native_cold_optimal(fam, n):
    rng = np.random.default_rng(zlib.crc32(f"{fam}:{n}".encode()))
    C = FAMILIES[fam](n, rng)
    x, y, cost = native.lapjv_native(C)
    assert sorted(x.tolist()) == list(range(n))
    assert np.array_equal(x[y], np.arange(n))
    assert abs(cost - _opt(C)) < 1e-8 * max(1, abs(_opt(C)))


def test_native_cold_returns_optimal_duals():
    rng = np.random.default_rng(0)
    C = FAMILIES["uniform"](50, rng)
    x, y, cost, u, v = native.lapjv_native(C, return_duals=True)
    red = C - u[:, None] - v[None, :]
    assert red.min() >= -1e-9
    np.testing.assert_allclose(red[np.arange(50), x], 0.0, atol=1e-9)
    assert abs(u.sum() + v.sum() - cost) < 1e-8


@pytest.mark.parametrize("fam", ["uniform", "tie", "sparse", "metric"])
def test_native_seeded_oracle(fam):
    rng = np.random.default_rng(1)
    C = FAMILIES[fam](64, rng)
    u, v = oracle_duals_np(C)
    x, y, cost, info = native.lapjv_seeded_native(C, u, v, return_info=True)
    assert abs(cost - _opt(C)) < 1e-8 * max(1, abs(_opt(C)))


def test_native_seeded_zero_seed():
    rng = np.random.default_rng(2)
    C = FAMILIES["uniform"](40, rng)
    x, y, cost = native.lapjv_seeded_native(C, np.zeros(40), np.zeros(40))
    assert abs(cost - _opt(C)) < 1e-10


def test_native_seeded_garbage_seed_falls_back():
    rng = np.random.default_rng(3)
    C = FAMILIES["uniform"](40, rng)
    u = rng.normal(0, 100, 40)
    v = rng.normal(0, 100, 40)
    x, y, cost, info = native.lapjv_seeded_native(C, u, v, return_info=True)
    assert abs(cost - _opt(C)) < 1e-10


def test_native_agrees_with_jax_solver():
    import jax.numpy as jnp

    from lapgnn_tpu.solver.jv import lapjv_single

    rng = np.random.default_rng(4)
    C = FAMILIES["uniform"](80, rng)
    _, _, cost_native = native.lapjv_native(C)
    _, _, cost_jax = lapjv_single(jnp.asarray(C))
    assert abs(cost_native - float(cost_jax)) < 1e-9


def test_sparse_lapmod_matches_dense():
    rng = np.random.default_rng(5)
    C = FAMILIES["sparse"](60, rng)  # forbidden edges at 1e6
    row_ptr, col_idx, values = native.sparse_from_dense(C, forbidden_threshold=1e5)
    x, y, cost = native.lapmod_native(60, row_ptr, col_idx, values)
    # If the sparse instance is feasible on allowed edges only, the sparse
    # optimum equals the dense optimum (dense never picks a 1e6 edge when a
    # feasible allowed-edge matching exists and costs are < 1).
    assert sorted(x.tolist()) == list(range(60))
    dense_opt = _opt(C)
    if dense_opt < 1e5:  # dense solution used only allowed edges
        assert abs(cost - dense_opt) < 1e-8


def test_sparse_lapmod_duals_certify():
    rng = np.random.default_rng(6)
    C = FAMILIES["uniform"](40, rng)
    row_ptr, col_idx, values = native.sparse_from_dense(C)
    x, y, cost, u, v = native.lapmod_native(40, row_ptr, col_idx, values, return_duals=True)
    red = C - u[:, None] - v[None, :]
    assert red.min() >= -1e-9
    assert abs(cost - _opt(C)) < 1e-9


def test_sparse_lapmod_infeasible_raises():
    # Two rows that can only use the same single column -> no perfect matching.
    row_ptr = np.array([0, 1, 2], np.int32)
    col_idx = np.array([0, 0], np.int32)
    values = np.array([1.0, 2.0])
    with pytest.raises(native.NativeSolveError):
        native.lapmod_native(2, row_ptr, col_idx, values)


def test_dense_disconnected_row_raises_not_silent():
    """An all-inf row has no finite assignment; the dense path must raise
    NativeSolveError (rc=-1), not return rc=0 with x[i] = -1 (which callers
    would silently index as the last column)."""
    from lapgnn_tpu.solver.native import NativeSolveError, lapjv_native

    C = np.array([[np.inf, np.inf], [1.0, 2.0]])
    with pytest.raises(NativeSolveError):
        lapjv_native(C)


def test_seeded_rejects_short_seed():
    from lapgnn_tpu.solver.native import lapjv_seeded_native

    C = np.random.default_rng(0).uniform(0, 1, (8, 8))
    with pytest.raises(ValueError):
        lapjv_seeded_native(C, np.zeros(4), np.zeros(8))


def test_lapmod_rejects_bad_csr():
    from lapgnn_tpu.solver.native import lapmod_native

    with pytest.raises(ValueError):
        lapmod_native(
            4,
            np.array([0, 1, 2, 3, 4], np.int32),
            np.array([0, 1, 2, 9], np.int32),  # 9 >= n: OOB heap write in C++
            np.ones(4),
        )
    with pytest.raises(ValueError):
        lapmod_native(
            2,
            np.array([0, 2, 5], np.int32),  # row_ptr[n]=5 > len(col_idx)=3
            np.array([0, 1, 0], np.int32),
            np.ones(3),
        )


class TestRepairDuals:
    """Warm-started exact dual repair (lapx_repair_duals) — the bf16-transfer
    certificate's engine (pipeline._certify_and_polish step 1)."""

    def test_repairs_bf16_rounded_duals_to_exact_certificate(self):
        """The production scenario: solve a bf16-rounded copy, repair the
        duals against the TRUE matrix -> zero-gap exact certificate."""
        import ml_dtypes

        rng = np.random.default_rng(7)
        n = 256
        C = rng.uniform(0, 1, (n, n))
        Cb = C.astype(np.float32).astype(ml_dtypes.bfloat16).astype(np.float64)
        x, _, _, _, v_b = native.lapjv_native(Cb, return_duals=True)
        # bf16 duals are infeasible for the true matrix (this is the whole
        # reason the r3 certificate failed on every instance)...
        u_raw = C[np.arange(n), x] - v_b[x]
        assert (C - u_raw[:, None] - v_b[None, :]).min() < -1e-9

        rep = native.repair_duals_native(C, x, v_b)
        assert rep is not None
        v, min_red = rep
        # ...and the repaired pair certifies EXACT optimality: feasible with
        # zero complementary-slackness gap by construction.
        assert min_red >= -1e-12
        u = C[np.arange(n), x] - v[x]
        assert (C - u[:, None] - v[None, :]).min() >= -1e-12
        got = C[np.arange(n), x].sum()
        assert abs(got - _opt(C)) < 1e-9

    @pytest.mark.parametrize("fam", ["uniform", "metric", "low_rank", "tie"])
    def test_fixpoint_on_already_exact_duals_is_identity(self, fam):
        rng = np.random.default_rng(zlib.crc32(fam.encode()))
        C = FAMILIES[fam](96, rng)
        x, _, _, _, v = native.lapjv_native(C, return_duals=True)
        rep = native.repair_duals_native(C, x, v)
        assert rep is not None
        v2, min_red = rep
        assert min_red >= -1e-12
        np.testing.assert_allclose(v2, v, atol=1e-12)

    def test_suboptimal_assignment_never_certifies(self):
        """A suboptimal x induces a negative cycle: the relaxation budget
        blows up (None) — it must never return a passing certificate."""
        rng = np.random.default_rng(11)
        n = 128
        C = rng.uniform(0, 1, (n, n))
        x, _, _, _, v = native.lapjv_native(C, return_duals=True)
        x2 = x.copy()
        x2[[0, 1]] = x[[1, 0]]
        rep = native.repair_duals_native(C, x2, v)
        if rep is not None:  # converged: certificate must expose the gap
            assert rep[1] < -1e-9
        # (typically rep is None: budget exhausted on the negative cycle)

    def test_rejects_non_permutation(self):
        C = np.ones((4, 4))
        with pytest.raises(native.NativeSolveError):
            native.repair_duals_native(
                C, np.zeros(4, np.int64), np.zeros(4)
            )

    def test_nan_poisoned_duals_fail_certificate(self):
        rng = np.random.default_rng(3)
        C = rng.uniform(0, 1, (16, 16))
        x, _, _, _, v = native.lapjv_native(C, return_duals=True)
        v = v.copy()
        v[3] = np.nan
        rep = native.repair_duals_native(C, x, v)
        assert rep is None or not np.isfinite(rep[1])

    def test_cold_start_matches_reference_reconstruction(self):
        """From v=0 the repair reproduces the oracle-dual reconstruction's
        certificate (reference dual_computation.py:13-74 semantics)."""
        rng = np.random.default_rng(5)
        C = FAMILIES["uniform"](64, rng)
        r, c = scipy.optimize.linear_sum_assignment(C)
        x = np.empty(64, np.int64)
        x[r] = c
        rep = native.repair_duals_native(C, x, np.zeros(64))
        assert rep is not None and rep[1] >= -1e-12
