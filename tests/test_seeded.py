"""Seeded JV tests: optimality under any seed quality, fallback behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.ops.host_dual import oracle_duals_np, project_feasible_np
from lapgnn_tpu.solver.seeded import (
    greedy_tight_matching,
    lapjv_seeded_batch,
    lapjv_seeded_single,
)

_seeded = jax.jit(lapjv_seeded_single)


def _opt(C):
    r, c = scipy.optimize.linear_sum_assignment(C)
    return C[r, c].sum()


def _assert_optimal(C, u, v, atol=1e-9):
    res = _seeded(jnp.asarray(C), jnp.asarray(u), jnp.asarray(v))
    opt = _opt(C)
    n = C.shape[0]
    x = np.asarray(res.col_of_row)
    assert sorted(x.tolist()) == list(range(n))
    assert abs(float(res.cost) - opt) <= atol * max(1.0, abs(opt))
    return res


@pytest.mark.parametrize("fam", ["uniform", "metric", "tie", "sparse", "low_rank"])
def test_zero_seed_still_optimal(fam):
    """Zero seed == cold solve equivalence (LAP/test_seeded.py:6-47)."""
    rng = np.random.default_rng(1)
    C = FAMILIES[fam](48, rng)
    _assert_optimal(C, np.zeros(48), np.zeros(48))


@pytest.mark.parametrize("fam", ["uniform", "tie", "sparse", "block"])
def test_oracle_seed_optimal_no_fallback(fam):
    rng = np.random.default_rng(2)
    C = FAMILIES[fam](64, rng)
    u, v = oracle_duals_np(C)
    res = _assert_optimal(C, u, v)
    assert not bool(res.used_fallback), "oracle duals must not trigger fallback"


@pytest.mark.parametrize("noise", [0.05, 0.2, 1.0])
def test_noisy_seed_optimal(noise):
    """Noise only affects speed, never optimality (main_benchmark noise sweep)."""
    rng = np.random.default_rng(3)
    C = FAMILIES["uniform"](48, rng)
    u, v = oracle_duals_np(C, noise_level=noise)
    u, v = project_feasible_np(C, u, v)
    _assert_optimal(C, u, v)


def test_garbage_seed_optimal_via_fallback():
    rng = np.random.default_rng(4)
    C = FAMILIES["uniform"](40, rng)
    u = rng.normal(0, 100, 40)
    v = rng.normal(0, 100, 40)
    _assert_optimal(C, u, v)


def test_infeasible_seed_projected_not_error():
    """Design deviation from the reference: the projection guarantees
    feasibility, so no -3 error path exists (lapjv_seeded.cpp:51-53)."""
    rng = np.random.default_rng(5)
    C = FAMILIES["uniform"](16, rng)
    u = np.full(16, 10.0)  # grossly infeasible: u+v >> C
    v = np.full(16, 10.0)
    _assert_optimal(C, u, v)


def test_batch_seeded(rng):
    Cs = np.stack([FAMILIES["uniform"](24, rng) for _ in range(3)])
    us, vs = [], []
    for b in range(3):
        u, v = oracle_duals_np(Cs[b])
        us.append(u)
        vs.append(v)
    res = lapjv_seeded_batch(jnp.asarray(Cs), jnp.asarray(us), jnp.asarray(vs))
    for b in range(3):
        assert abs(float(res.cost[b]) - _opt(Cs[b])) < 1e-9


def test_greedy_tight_matching_maximal():
    """The greedy phase must return a maximal matching on the tight graph."""
    rng = np.random.default_rng(6)
    tight = rng.random((32, 32)) < 0.15
    x, y = greedy_tight_matching(jnp.asarray(tight))
    x, y = np.asarray(x), np.asarray(y)
    for i, j in enumerate(x):
        if j >= 0:
            assert tight[i, j] and y[j] == i
    # Maximality: no free row has a tight edge to a free column.
    free_rows = x < 0
    free_cols = y < 0
    assert not tight[np.ix_(free_rows, free_cols)].any()


def test_greedy_tight_matching_degenerate_all_tight():
    """All-tight matrix (ties everywhere) must still fully match quickly."""
    tight = jnp.ones((64, 64), bool)
    x, y = greedy_tight_matching(tight)
    assert (np.asarray(x) >= 0).all()
    assert sorted(np.asarray(x).tolist()) == list(range(64))


def test_seeded_float32():
    rng = np.random.default_rng(8)
    C = FAMILIES["uniform"](48, rng)
    u, v = oracle_duals_np(C)
    res = _seeded(
        jnp.asarray(C, jnp.float32),
        jnp.asarray(u, jnp.float32),
        jnp.asarray(v, jnp.float32),
    )
    assert abs(float(res.cost) - _opt(C)) < 1e-3


@pytest.mark.parametrize("gate", ["density", "free_rows", "never"])
@pytest.mark.slow
def test_gates_all_exactly_optimal(gate):
    """Every gate mode stays exactly optimal for good, noisy, and garbage seeds."""
    rng = np.random.default_rng(10)
    C = FAMILIES["uniform"](40, rng)
    seeds = [
        oracle_duals_np(C),
        project_feasible_np(C, *oracle_duals_np(C, noise_level=0.3)),
        (rng.normal(0, 50, 40), rng.normal(0, 50, 40)),
    ]
    for u, v in seeds:
        res = lapjv_seeded_single(
            jnp.asarray(C), jnp.asarray(u), jnp.asarray(v), gate=gate
        )
        assert abs(float(res.cost) - _opt(C)) < 1e-9


def test_free_rows_gate_avoids_spurious_fallback():
    """A min-trick seed from decent-but-noisy u must not fall back under the
    free-rows gate even when the density gate would trigger."""
    rng = np.random.default_rng(11)
    C = FAMILIES["uniform"](64, rng)
    u_star, _ = oracle_duals_np(C)
    u = u_star + rng.normal(0, 0.02, 64)
    v = (C - u[:, None]).min(axis=0)  # min-trick
    res_fr = lapjv_seeded_single(
        jnp.asarray(C), jnp.asarray(u), jnp.asarray(v), gate="free_rows"
    )
    assert not bool(res_fr.used_fallback)
    assert abs(float(res_fr.cost) - _opt(C)) < 1e-9


def test_mixed_size_padded_batch_seeded():
    """Mixed-size instances solved as one padded batch: pad blocks are
    identity-like so padded optima equal the originals."""
    from lapgnn_tpu.ops.padding import pad_batch, unpad_assignment

    rng = np.random.default_rng(12)
    sizes = [13, 20, 20]
    Cs = [FAMILIES["uniform"](s, rng) for s in sizes]
    batch, mask = pad_batch(Cs, target_n=20)
    u = np.zeros((3, 20))
    v = np.zeros((3, 20))
    res = lapjv_seeded_batch(jnp.asarray(batch), jnp.asarray(u), jnp.asarray(v))
    for b, C in enumerate(Cs):
        n = sizes[b]
        x = unpad_assignment(np.asarray(res.col_of_row[b]), n)
        got = C[np.arange(n), x].sum()
        assert abs(got - _opt(C)) < 1e-9


def test_jacobi_arr_invariants(rng):
    """After any number of ARR rounds: dual feasibility holds and every
    matched edge is its row's minimum slack (tight)."""
    from lapgnn_tpu.solver.jv import column_reduction
    from lapgnn_tpu.solver.seeded import jacobi_arr

    C = FAMILIES["uniform"](48, rng)
    Cj = jnp.asarray(C)
    m = column_reduction(Cj)
    m2 = jacobi_arr(Cj, m, max_rounds=32)

    x = np.asarray(m2.col_of_row)
    y = np.asarray(m2.row_of_col)
    v = np.asarray(m2.v)
    # Matching consistency.
    for i, j in enumerate(x):
        if j >= 0:
            assert y[j] == i
    slack = C - v[None, :]
    u = slack.min(axis=1)
    red = slack - u[:, None]
    assert red.min() >= -1e-9, "ARR must preserve dual feasibility"
    matched = x >= 0
    rows = np.nonzero(matched)[0]
    np.testing.assert_allclose(red[rows, x[rows]], 0.0, atol=1e-8)


def test_augment_all_sweep_from_column_reduction(rng):
    """Sweep augmentation alone must complete any partial matching optimally."""
    from lapgnn_tpu.solver.jv import (
        augment_all_sweep,
        column_reduction,
        matching_cost,
    )

    for fam in ["uniform", "tie", "metric"]:
        C = FAMILIES[fam](40, rng)
        Cj = jnp.asarray(C)
        m = augment_all_sweep(Cj, column_reduction(Cj))
        x = np.asarray(m.col_of_row)
        assert sorted(x.tolist()) == list(range(40))
        assert abs(float(matching_cost(Cj, m.col_of_row)) - _opt(C)) < 1e-9


def test_nan_cost_returns_instead_of_hanging():
    """A NaN entry must not hang the jitted solve (the outer augmentation
    loops are bounded at n+1 rounds); the partial result is reported via a
    NaN cost / non-permutation, not a deadlock."""
    import time

    n = 16
    rng = np.random.default_rng(0)
    C = rng.uniform(0, 1, (n, n)).astype(np.float32)
    C[3, :] = np.nan
    u = np.zeros(n, np.float32)
    v = np.nanmin(C, axis=0).astype(np.float32)
    t0 = time.time()
    res = lapjv_seeded_single(jnp.asarray(C), jnp.asarray(u), jnp.asarray(v), gate="never")
    cost = float(res.cost)
    assert time.time() - t0 < 60.0
    x = np.asarray(res.col_of_row)
    # poisoned input: either an incomplete matching or a NaN cost — never a
    # silently-wrong finite answer
    assert (x < 0).any() or np.isnan(cost)


@pytest.mark.slow
def test_arr_rounds_zero_disables_arr_phase():
    """arr_rounds=0 must actually skip the Jacobi ARR phase (falsy-zero bug):
    the sweep augmentation alone still reaches the exact optimum."""
    rng = np.random.default_rng(1)
    n = 32
    C = rng.uniform(0, 1, (n, n))
    C32 = jnp.asarray(C, jnp.float32)
    v = jnp.min(C32, axis=0)
    res = lapjv_seeded_single(C32, jnp.zeros(n, jnp.float32), v, gate="never", arr_rounds=0)
    r, c = scipy.optimize.linear_sum_assignment(C)
    assert float(res.cost) == pytest.approx(C[r, c].sum(), rel=1e-6)
    # batch path forwards the knob too
    resb = lapjv_seeded_batch(C32[None], jnp.zeros((1, n), jnp.float32), v[None],
                              gate="never", arr_rounds=0)
    assert float(resb.cost[0]) == pytest.approx(C[r, c].sum(), rel=1e-6)


def test_n1_column_reduction_finite_duals():
    """n=1: the reduction-transfer min is over an empty set; v must stay
    finite (was -inf, poisoning the dual certificate)."""
    from lapgnn_tpu.solver.jv import column_reduction

    m = column_reduction(jnp.asarray([[3.5]], jnp.float32))
    assert int(m.col_of_row[0]) == 0
    assert np.isfinite(float(m.v[0]))
