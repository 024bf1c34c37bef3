"""Dual math tests: JAX ops vs the NumPy host oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.ops import dual as D
from lapgnn_tpu.ops import host_dual as H


def _instance(fam="uniform", n=48, seed=0):
    rng = np.random.default_rng(seed)
    C = FAMILIES[fam](n, rng)
    r, c = scipy.optimize.linear_sum_assignment(C)
    return C, r, c


def test_min_trick_always_feasible(rng):
    C = FAMILIES["uniform"](40, rng)
    u = rng.normal(0, 1, 40)  # arbitrary u
    v = D.min_trick_v(jnp.asarray(C), jnp.asarray(u))
    assert bool(D.check_dual_feasible(jnp.asarray(C), jnp.asarray(u), v))


def test_tighten_rows_creates_zeros(rng):
    C = FAMILIES["uniform"](30, rng)
    v = np.zeros(30)
    u = D.tighten_rows(jnp.asarray(C), jnp.asarray(v))
    red = np.asarray(D.reduced_costs(jnp.asarray(C), u, jnp.asarray(v)))
    np.testing.assert_allclose(red.min(axis=1), 0.0, atol=1e-12)
    assert red.min() >= -1e-12


def test_project_feasible_matches_host(rng):
    C = FAMILIES["uniform"](32, rng)
    u0 = rng.normal(0, 0.5, 32)
    v0 = rng.normal(0, 0.5, 32)
    uj, vj = D.project_feasible(jnp.asarray(C), jnp.asarray(u0), jnp.asarray(v0))
    un, vn = H.project_feasible_np(C, u0, v0)
    np.testing.assert_allclose(np.asarray(uj), un, atol=1e-10)
    np.testing.assert_allclose(np.asarray(vj), vn, atol=1e-10)
    H.check_dual_feasible_np(C, np.asarray(uj), np.asarray(vj), tol=1e-8)


@pytest.mark.parametrize("fam", ["uniform", "metric", "tie", "sparse"])
def test_duals_from_matching_optimal(fam):
    C, r, c = _instance(fam, n=40)
    col_of_row = np.empty(40, np.int32)
    col_of_row[r] = c
    u, v = D.duals_from_matching(jnp.asarray(C), jnp.asarray(col_of_row))
    u, v = np.asarray(u), np.asarray(v)
    # Feasible + complementary slack => optimal duals; objective == primal opt.
    H.check_dual_and_match_np(C, u, v, r, c)
    opt = C[r, c].sum()
    assert abs(u.sum() + v.sum() - opt) < 1e-8 * max(1, abs(opt))


def test_duals_from_matching_matches_host_oracle():
    C, r, c = _instance("uniform", n=36, seed=3)
    col_of_row = np.empty(36, np.int32)
    col_of_row[r] = c
    uj, vj = D.duals_from_matching(jnp.asarray(C), jnp.asarray(col_of_row))
    un, vn, _ = H.duals_from_matching_np(C, r, c)
    np.testing.assert_allclose(np.asarray(uj), un, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vj), vn, atol=1e-8)


def test_oracle_duals_np_feasible_cs():
    C, r, c = _instance("low_rank", n=32, seed=4)
    u, v = H.oracle_duals_np(C)
    H.check_dual_and_match_np(C, u, v, r, c)


def test_center_gauge_masked():
    u = jnp.asarray([1.0, 2.0, 3.0, 99.0])
    mask = jnp.asarray([True, True, True, False])
    out = np.asarray(D.center_gauge(u, mask))
    assert abs(out[:3].sum()) < 1e-12
    assert out[3] == 0.0


def test_batched_shapes():
    rng = np.random.default_rng(1)
    C = np.stack([FAMILIES["uniform"](16, rng) for _ in range(3)])
    u = rng.normal(size=(3, 16))
    v = D.min_trick_v(jnp.asarray(C), jnp.asarray(u))
    assert v.shape == (3, 16)
    feas = D.check_dual_feasible(jnp.asarray(C), jnp.asarray(u), v)
    assert feas.shape == (3,) and bool(feas.all())


def test_dual_objective_lower_bound():
    C, r, c = _instance("uniform", n=24, seed=9)
    u, v = H.oracle_duals_np(C, noise_level=0.0)
    obj = float(D.dual_objective(jnp.asarray(u), jnp.asarray(v)))
    assert obj <= C[r, c].sum() + 1e-8


def test_pad_cost_matrix_preserves_optimum():
    import jax.numpy as jnp
    import scipy.optimize

    from lapgnn_tpu.ops.padding import pad_batch, pad_cost_matrix, unpad_assignment
    from lapgnn_tpu.solver.jv import lapjv_single

    rng = np.random.default_rng(0)
    C = FAMILIES["uniform"](13, rng)
    P = pad_cost_matrix(C, 16)
    r, c = scipy.optimize.linear_sum_assignment(C)
    x, y, cost = lapjv_single(jnp.asarray(P))
    assert abs(float(cost) - C[r, c].sum()) < 1e-9
    x_valid = unpad_assignment(np.asarray(x), 13)
    assert sorted(x_valid.tolist()) == list(range(13))

    batch, mask = pad_batch([C, FAMILIES["uniform"](16, rng)])
    assert batch.shape == (2, 16, 16)
    assert mask[0].sum() == 13 and mask[1].sum() == 16
