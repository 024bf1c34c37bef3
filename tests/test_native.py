"""Native C++ lapx solver tests (the float64 host oracle)."""

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
    rng = np.random.default_rng(hash((fam, n)) % 2**31)
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
