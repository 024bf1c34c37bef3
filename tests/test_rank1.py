"""Rank-1 analytic dual seed (ops/rank1.py) + pipeline seed selection.

Net-new vs the reference: closed-form Monge duals for rank-1-dominant costs
(the noisy_linear / low_rank families, reference solvers/generators.py:
126-135), selected per instance against the GNN seed by projected dual
objective.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.ops.dual import fast_min_trick
from lapgnn_tpu.ops.features import row_features
from lapgnn_tpu.ops.rank1 import rank1_duals, rank1_fit, select_best_seed


def _opt(C):
    r, c = scipy.optimize.linear_sum_assignment(C)
    return C[r, c].sum()


def test_rank1_fit_recovers_factors_under_shift():
    """Mean-centering must defeat the families' `C -= C.min()` shift (which
    makes the matrix rank-2 with a dominant constant)."""
    rng = np.random.default_rng(0)
    n = 96
    a, b = rng.normal(size=n), rng.normal(size=n)
    C = np.outer(a, b)
    C -= C.min()
    af, bf, delta = rank1_fit(jnp.asarray(C, jnp.float32))
    R = np.asarray(af)[:, None] * np.asarray(bf)[None, :] + float(delta)
    # Mean-centering leaves an O(mean(a)*mean(b)) rank-2 residual, so the fit
    # is near- (not exactly) rank-1: a few percent relative Frobenius error,
    # vs ~100% for the uncentered fit that latches onto the shift constant.
    rel = np.linalg.norm(R - C) / np.linalg.norm(C - C.mean())
    assert rel < 0.05


def test_rank1_duals_exact_on_rank1():
    """Zero dual gap (up to f32 rounding) on an exactly rank-1(+const) cost,
    and the min-trick-projected pair is feasible."""
    rng = np.random.default_rng(1)
    n = 128
    C = np.outer(rng.normal(size=n), rng.normal(size=n))
    C -= C.min()
    Cj = jnp.asarray(C, jnp.float32)
    u, _ = rank1_duals(Cj)
    v = np.asarray(fast_min_trick(Cj, u))
    u = np.asarray(u)
    gap = _opt(C) - u.sum() - v.sum()
    assert 0.0 <= gap + 1e-3 and gap < 1e-2 * max(1.0, abs(_opt(C)))
    red = C - u[:, None] - v[None, :]
    assert red.min() > -1e-4


def test_rank1_duals_tight_on_noisy_linear():
    """On noise=0.1 noisy_linear the projected gap must be a tiny fraction
    of the zero-seed gap (measured ~80x better at n=256)."""
    rng = np.random.default_rng(2)
    C = FAMILIES["noisy_linear"](256, rng).astype(np.float64)
    Cj = jnp.asarray(C, jnp.float32)
    u, _ = rank1_duals(Cj)
    v = np.asarray(fast_min_trick(Cj, u))
    opt = _opt(C)
    gap_r1 = opt - np.asarray(u).sum() - v.sum()
    gap_zero = opt - C.min(axis=0).sum()
    assert gap_r1 < 0.05 * gap_zero


def test_rank1_duals_batched_matches_single():
    rng = np.random.default_rng(3)
    Cs = np.stack(
        [FAMILIES["noisy_linear"](64, rng) for _ in range(3)]
    ).astype(np.float32)
    ub, vb = rank1_duals(jnp.asarray(Cs))
    for i in range(3):
        ui, vi = rank1_duals(jnp.asarray(Cs[i]))
        np.testing.assert_allclose(np.asarray(ub[i]), np.asarray(ui), atol=1e-4)
        np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(vi), atol=1e-4)


def test_select_best_seed_per_instance():
    """Selection is per instance: rank-1 wins on the rank-1 instance, the
    alternative (zero) wins on uniform; the returned v is the min-trick
    projection of the winner."""
    rng = np.random.default_rng(4)
    n = 96
    C0 = np.outer(rng.normal(size=n), rng.normal(size=n))
    C0 -= C0.min()
    C1 = rng.uniform(0, 1, (n, n))
    Cb = jnp.asarray(np.stack([C0, C1]), jnp.float32)
    u_r1, _ = rank1_duals(Cb)
    u_zero = jnp.zeros((2, n), jnp.float32)
    u, v = select_best_seed(Cb, (u_zero, u_r1))
    np.testing.assert_allclose(np.asarray(u[0]), np.asarray(u_r1[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(u[1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(fast_min_trick(Cb, u)), atol=1e-6
    )


@pytest.mark.parametrize("family", ["noisy_linear", "uniform", "sparse"])
@pytest.mark.slow
def test_pipeline_auto_seed_exact_and_warm(family, rng):
    """seed_mode='auto' keeps exact optimality everywhere and turns
    noisy_linear from a guaranteed cold fallback into a warm solve."""
    from lapgnn_tpu.models import OneGNN
    from lapgnn_tpu.pipeline import WarmStartPipeline

    model = OneGNN(hidden=16, layers=1, topk=4)
    Ci = jnp.asarray(rng.uniform(0, 1, (1, 16, 16)), jnp.float32)
    params = model.init(jax.random.key(0), row_features(Ci), cost=Ci)

    C = np.stack([FAMILIES[family](48, rng) for _ in range(2)])
    pipe = WarmStartPipeline(model, params, mode="device", seed_mode="auto")
    out = pipe.solve(C)
    for b in range(2):
        assert np.isclose(out["cost"][b], _opt(C[b]), rtol=1e-5, atol=1e-5)
    if family == "noisy_linear":
        assert not out["used_fallback"].any()


def test_pipeline_seed_mode_validation(rng):
    from lapgnn_tpu.pipeline import predict_duals_fn
    from lapgnn_tpu.models import OneGNN

    with pytest.raises(ValueError):
        predict_duals_fn(OneGNN(hidden=8, layers=1, topk=4), seed_mode="bogus")
