"""Loss tests: greedy primal upper bound + combined training losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.ops.host_dual import oracle_duals_np
from lapgnn_tpu.train.loss import (
    dual_gnn_loss,
    greedy_primal_upper,
    masked_v_proj,
    one_gnn_loss,
)


def _greedy_oracle(cost, reduced):
    """Host transcription of the reference's greedy (train_one_gnn.py:137-177)."""
    n = cost.shape[0]
    used = set()
    assignment = {}
    for row in np.argsort(reduced.min(axis=1), kind="stable"):
        for col in np.argsort(reduced[row], kind="stable"):
            if col not in used:
                assignment[row] = col
                used.add(int(col))
                break
    return sum(cost[r, c] for r, c in assignment.items())


@pytest.mark.parametrize("n", [8, 32])
def test_greedy_matches_host_oracle(n):
    rng = np.random.default_rng(n)
    cost = FAMILIES["uniform"](n, rng)
    u, v = oracle_duals_np(cost, noise_level=0.3)
    reduced = cost - u[:, None] - v[None, :]
    got = float(greedy_primal_upper(jnp.asarray(cost)[None], jnp.asarray(reduced)[None])[0])
    want = _greedy_oracle(cost, reduced)
    assert abs(got - want) < 1e-8


def test_greedy_upper_bounds_optimum(rng):
    cost = FAMILIES["uniform"](24, rng)
    r, c = scipy.optimize.linear_sum_assignment(cost)
    u, v = oracle_duals_np(cost)
    reduced = cost - u[:, None] - v[None, :]
    ub = float(greedy_primal_upper(jnp.asarray(cost)[None], jnp.asarray(reduced)[None])[0])
    assert ub >= cost[r, c].sum() - 1e-9


def test_greedy_with_oracle_duals_is_tightish(rng):
    """With exact duals the greedy follows tight edges; gap should be small."""
    cost = FAMILIES["uniform"](32, rng)
    r, c = scipy.optimize.linear_sum_assignment(cost)
    u, v = oracle_duals_np(cost)
    reduced = cost - u[:, None] - v[None, :]
    ub = float(greedy_primal_upper(jnp.asarray(cost)[None], jnp.asarray(reduced)[None])[0])
    opt = cost[r, c].sum()
    # Greedy offers no approximation guarantee; this is a loose sanity bound
    # (a random permutation on uniform costs averages ~n/2 = 16).
    assert ub - opt < 8.0


def test_masked_v_proj_feasible(rng):
    cost = np.stack([FAMILIES["uniform"](16, rng) for _ in range(2)])
    u = rng.normal(0, 0.1, (2, 16))
    mask = np.ones((2, 16), bool)
    mask[0, 12:] = False
    v = np.asarray(masked_v_proj(jnp.asarray(cost), jnp.asarray(u), jnp.asarray(mask)))
    np.testing.assert_allclose(v[0, 12:], 0.0)
    red = cost[0][:12, :12] - u[0][:12, None] - v[0][None, :12]
    assert red.min() >= -1e-9


def test_one_gnn_loss_zero_at_oracle(rng):
    """With u = u*, primal gap and feasibility terms vanish (up to greedy tie
    breaking), so the loss should be tiny."""
    cost = FAMILIES["uniform"](24, rng)
    u, v = oracle_duals_np(cost)
    loss, metrics = one_gnn_loss(
        jnp.asarray(cost)[None], jnp.asarray(u)[None], {"u": jnp.asarray(u)[None]}
    )
    assert float(metrics["feas"][0]) < 1e-8
    assert float(metrics["primal_gap"][0]) < 0.5


def test_one_gnn_loss_differentiable(rng):
    cost = jnp.asarray(np.stack([FAMILIES["uniform"](12, rng) for _ in range(2)]))
    u_t = jnp.zeros((2, 12))

    def f(u_pred):
        loss, _ = one_gnn_loss(cost, u_t, {"u": u_pred})
        return loss

    g = jax.grad(f)(jnp.ones((2, 12)) * 0.01)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_dual_gnn_loss_runs(rng):
    cost = jnp.asarray(np.stack([FAMILIES["uniform"](10, rng) for _ in range(2)]))
    preds = {"u": jnp.zeros((2, 10)), "v_hint": jnp.zeros((2, 10))}
    loss, metrics = dual_gnn_loss(cost, preds)
    assert np.isfinite(float(loss))
    assert "v_mse" in metrics


def test_clip_cost_sentinels_removes_forbidden_domination(rng):
    from lapgnn_tpu.data.generators import DATASET_SPARSE_FORBIDDEN
    from lapgnn_tpu.train.loss import clip_cost_sentinels, dual_gnn_loss

    n = 24
    C = rng.uniform(0, 1, (2, n, n))
    forbid = rng.uniform(0, 1, (2, n, n)) < 0.6
    # keep a diagonal feasible
    forbid[:, np.arange(n), np.arange(n)] = False
    C = np.where(forbid, DATASET_SPARSE_FORBIDDEN, C)
    Cd = jnp.asarray(C, jnp.float32)

    clipped = np.asarray(clip_cost_sentinels(Cd))
    assert clipped.max() <= 1.0 + 1e-6  # sentinels clipped to finite max
    assert np.allclose(clipped[~forbid], C[~forbid])  # real costs untouched

    preds = {
        "u": jnp.zeros((2, n), jnp.float32),
        "v_hint": jnp.zeros((2, n), jnp.float32),
    }
    loss_raw, _ = dual_gnn_loss(Cd, preds)
    loss_clip, metrics = dual_gnn_loss(
        Cd, preds, clip_sentinels=True, normalize_gap=True
    )
    # raw loss is sentinel-dominated (greedy collisions pay ~1e6 each);
    # the clipped+normalised loss is at the real cost scale
    assert float(loss_raw) > 1e4
    assert float(loss_clip) < 1e2
    assert np.isfinite(float(loss_clip))


def test_clip_sentinels_all_sentinel_instance_unclipped(rng):
    from lapgnn_tpu.train.loss import clip_cost_sentinels

    C = jnp.full((1, 8, 8), 1.0e6, jnp.float32)
    out = np.asarray(clip_cost_sentinels(C))
    np.testing.assert_allclose(out, 1.0e6)


def test_dual_gnn_loss_supervision_is_gauge_invariant(rng):
    """The u_target term must penalise shape, not the unidentifiable gauge:
    shifting u_pred by a constant changes primal/feas but NOT the
    supervision term, and a gauge-shifted target scores identically."""
    cost = jnp.asarray(np.stack([FAMILIES["uniform"](10, rng) for _ in range(2)]))
    u_t = jnp.asarray(rng.normal(0, 0.2, (2, 10)).astype(np.float32))
    preds = {"u": jnp.zeros((2, 10)), "v_hint": jnp.zeros((2, 10))}

    _, m0 = dual_gnn_loss(cost, preds, u_target=u_t)
    _, m1 = dual_gnn_loss(cost, preds, u_target=u_t + 3.7)
    np.testing.assert_allclose(
        np.asarray(m0["u_mse_gauge"]), np.asarray(m1["u_mse_gauge"]),
        rtol=1e-5, atol=1e-6,
    )
    # exact-up-to-gauge prediction => zero supervision term
    preds_exact = {"u": u_t - 1.25, "v_hint": jnp.zeros((2, 10))}
    _, m2 = dual_gnn_loss(cost, preds_exact, u_target=u_t)
    assert float(np.abs(np.asarray(m2["u_mse_gauge"])).max()) < 1e-9
    # and the term increases the loss for a wrong prediction
    l_sup, _ = dual_gnn_loss(cost, preds, u_target=u_t)
    l_uns, _ = dual_gnn_loss(cost, preds)
    assert float(l_sup) > float(l_uns)
