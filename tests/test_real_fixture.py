"""Vendored OR-Library-format fixture: parse -> solve -> exact optimality.

First real-instance-format coverage (reference data/processors.py:21-43 +
generate_dataset.py:91-124).  The fixture file is OR-Library `.assign`
format (n, then n*n integer costs), committed under data/real/.
"""

from pathlib import Path

import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.processors import iter_real_instances, parse_orlib_assign

FIXTURE = Path(__file__).resolve().parent.parent / "data" / "real" / "assignp200.assign.gz"
KNOWN_OPT = 267.0  # scipy linear_sum_assignment on the committed fixture


def test_parse_fixture():
    inst = parse_orlib_assign(FIXTURE)
    assert inst.cost.shape == (200, 200)
    assert inst.source == "orlib"
    assert inst.cost.min() >= 1 and inst.cost.max() <= 100


def test_fixture_known_optimum():
    inst = parse_orlib_assign(FIXTURE)
    r, c = scipy.optimize.linear_sum_assignment(inst.cost)
    assert float(inst.cost[r, c].sum()) == KNOWN_OPT


def test_native_solver_on_fixture():
    from lapgnn_tpu.solver import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    inst = parse_orlib_assign(FIXTURE)
    x, y, cost = native.lapjv_native(inst.cost)
    assert cost == pytest.approx(KNOWN_OPT, abs=1e-9)


def test_device_solver_on_fixture():
    import jax.numpy as jnp

    from lapgnn_tpu.solver.seeded import lapjv_seeded_single

    inst = parse_orlib_assign(FIXTURE)
    C = jnp.asarray(inst.cost, jnp.float32)
    n = C.shape[0]
    u0 = jnp.zeros(n, jnp.float32)
    v0 = jnp.min(C, axis=0)
    res = lapjv_seeded_single(C, u0, v0, gate="free_rows")
    x = np.asarray(res.col_of_row)
    assert sorted(x.tolist()) == list(range(n))
    got = float(inst.cost[np.arange(n), x].sum())
    assert got == pytest.approx(KNOWN_OPT, abs=1e-6)


def test_iter_real_instances_finds_fixture():
    found = [
        inst
        for inst in iter_real_instances([FIXTURE])
        if inst.name.startswith("assignp200")
    ]
    assert len(found) == 1
    assert found[0].cost.shape == (200, 200)


# ---------------------------------------------------------------------------
# SuiteSparse-format (.mtx) fixture (reference data/processors.py:46-59)
# ---------------------------------------------------------------------------

MTX_FIXTURE = FIXTURE.parent / "sample_graph64.mtx.gz"
MTX_KNOWN_OPT = 0.0  # sparse->dense leaves unstored entries at 0 cost, and a
# 0-cost perfect matching exists among them — the documented degeneracy of
# the reference's todense conversion; the value of the fixture is exercising
# parse -> normalize -> solve on real MatrixMarket bytes plus a tie-heavy
# exactness case.


class TestMatrixMarketFixture:
    def test_parse(self):
        from lapgnn_tpu.data.processors import parse_matrix_market

        inst = parse_matrix_market(MTX_FIXTURE)
        assert inst.source == "suitesparse"
        assert inst.cost.shape == (64, 64)
        assert inst.cost.max() > 0  # stored values survived densification

    def test_normalize_solve_optimal_native(self):
        from lapgnn_tpu.data.processors import (
            normalize_cost_matrix, parse_matrix_market,
        )
        from lapgnn_tpu.solver import native

        if not native.native_available():
            pytest.skip("native toolchain unavailable")
        inst = parse_matrix_market(MTX_FIXTURE)
        C = normalize_cost_matrix(inst.cost)
        x, y, cost = native.lapjv_native(C)
        r, c = scipy.optimize.linear_sum_assignment(C)
        assert cost == pytest.approx(float(C[r, c].sum()), abs=1e-12)
        assert cost == pytest.approx(MTX_KNOWN_OPT, abs=1e-12)

    def test_device_solver_ties(self):
        """Tie-heavy zero-cost instance: the batched device JV must still
        return an exactly optimal permutation."""
        import jax.numpy as jnp

        from lapgnn_tpu.data.processors import (
            normalize_cost_matrix, parse_matrix_market,
        )
        from lapgnn_tpu.solver.jv import lapjv_batch

        inst = parse_matrix_market(MTX_FIXTURE)
        C = normalize_cost_matrix(inst.cost)
        col_of_row, _, _ = lapjv_batch(jnp.asarray(C[None], jnp.float32))
        x = np.asarray(col_of_row[0])
        n = C.shape[0]
        assert sorted(x.tolist()) == list(range(n))
        assert float(C[np.arange(n), x].sum()) == pytest.approx(
            MTX_KNOWN_OPT, abs=1e-6
        )


# ---------------------------------------------------------------------------
# STRING-format links fixture (reference data/processors.py:62-144)
# ---------------------------------------------------------------------------

STRING_FIXTURE = FIXTURE.parent / "sample_9606.protein.links.v12.0.txt.gz"


class TestStringFixture:
    def test_parse(self):
        from lapgnn_tpu.data.processors import string_links_to_cost

        inst = string_links_to_cost(STRING_FIXTURE)
        assert inst.source == "string"
        n = inst.cost.shape[0]
        assert n == 48
        assert np.allclose(np.diag(inst.cost), 0.0)  # documented degeneracy
        # symmetric scores, costs in [0, 1]
        assert np.allclose(inst.cost, inst.cost.T)
        assert inst.cost.min() >= 0.0 and inst.cost.max() <= 1.0
        # linked pairs got 1 - score/1000 (< 1), unlinked stayed 1.0
        off = inst.cost[~np.eye(n, dtype=bool)]
        assert (off < 1.0).any() and (off == 1.0).any()

    def test_solve_off_diagonal_subproblem(self):
        """Mask the trivial diagonal (cost += BIG on i==j) to get a
        non-degenerate matching over actual link scores; solve exactly."""
        from lapgnn_tpu.data.processors import string_links_to_cost
        from lapgnn_tpu.solver import native

        if not native.native_available():
            pytest.skip("native toolchain unavailable")
        inst = string_links_to_cost(STRING_FIXTURE)
        C = inst.cost + np.eye(inst.cost.shape[0]) * 100.0
        x, y, cost = native.lapjv_native(C)
        r, c = scipy.optimize.linear_sum_assignment(C)
        assert cost == pytest.approx(float(C[r, c].sum()), abs=1e-12)
        assert (x != np.arange(len(x))).all()  # diagonal actually avoided

    def test_max_nodes_cap(self):
        from lapgnn_tpu.data.processors import string_links_to_cost

        inst = string_links_to_cost(STRING_FIXTURE, max_nodes=16)
        assert inst.cost.shape == (16, 16)


def test_iter_real_instances_multiplexes_all_three_sources():
    insts = list(iter_real_instances([FIXTURE, MTX_FIXTURE, STRING_FIXTURE]))
    assert [i.source for i in insts] == ["orlib", "suitesparse", "string"]


def test_regression_real_rows_cover_all_sources(tmp_path):
    """bench/regression.run_real produces a row per vendored fixture with
    the exactness gate passing (parse -> normalize -> solve end to end)."""
    from lapgnn_tpu.bench.regression import run_real

    rows = run_real([FIXTURE, MTX_FIXTURE, STRING_FIXTURE], repeats=1)
    assert {cell["source"] for cell in rows.values()} == {
        "orlib", "suitesparse", "string"
    }
    for cell in rows.values():
        assert cell["scipy_ms"] > 0 and cell["lapx_dense_ms"] > 0
