"""Entropic dual refinement (ops/sinkhorn.py) + collision-vetoed selection.

Net-new capability closing the noisy_linear accuracy gap (VERDICT r3 #4,
docs/ACCURACY_LADDER.md): model-free Sinkhorn ascent from any seed.
"""

import numpy as np
import pytest
import scipy.optimize

import jax.numpy as jnp

from lapgnn_tpu.data.generators import FAMILIES, generate_noisy_linear_costs
from lapgnn_tpu.ops.rank1 import rank1_duals, select_best_seed
from lapgnn_tpu.ops.sinkhorn import sinkhorn_refine, uniq_argmin_count


def _feasible(C, u, v, tol=1e-5):
    return float((C - u[:, None] - v[None, :]).min()) >= -tol


@pytest.mark.parametrize("fam", sorted(FAMILIES))
def test_refine_improves_objective_and_stays_feasible(fam):
    n = 96
    rng = np.random.default_rng(5)
    C = FAMILIES[fam](n, rng)
    Cd = jnp.asarray(C, jnp.float32)[None]
    u0, _ = rank1_duals(Cd)
    v0 = jnp.min(Cd - u0[..., :, None], axis=-2)
    u, v = sinkhorn_refine(Cd, u0)
    u_np = np.asarray(u[0], np.float64)
    v_np = np.asarray(v[0], np.float64)
    assert _feasible(C, u_np, v_np, tol=1e-3 * max(1.0, abs(C).max() / 1e3))
    obj0 = float(jnp.sum(u0) + jnp.sum(v0))
    obj1 = u_np.sum() + v_np.sum()
    # never meaningfully worse; scale-aware slack for f32 accumulation
    slack = 1e-4 * n * max(1.0, float(np.abs(C).max()))
    assert obj1 >= obj0 - slack, (fam, obj0, obj1)


def test_noisy_linear_gap_closed():
    """The headline: refinement takes the rank-1 seed's pre-solve greedy
    gap from ~17 to < 5 and its dual gap to ~0 (VERDICT r3 target)."""
    from lapgnn_tpu.train.loss import greedy_primal_upper

    gaps, maes, dgaps = [], [], []
    for seed in range(4):
        C = generate_noisy_linear_costs(256, noise=0.1, seed=seed)
        r, c = scipy.optimize.linear_sum_assignment(C)
        opt = float(C[r, c].sum())
        Cd = jnp.asarray(C, jnp.float32)[None]
        u0, _ = rank1_duals(Cd)
        u, v = sinkhorn_refine(Cd, u0)
        u_np, v_np = np.asarray(u[0], np.float64), np.asarray(v[0], np.float64)
        assert _feasible(C, u_np, v_np, tol=1e-4)
        dgaps.append(opt - (u_np.sum() + v_np.sum()))
        red = C - u_np[:, None] - v_np[None, :]
        ub = float(
            greedy_primal_upper(jnp.asarray(C)[None], jnp.asarray(red)[None])[0]
        )
        gaps.append(ub - opt)
        from lapgnn_tpu.ops.host_dual import oracle_duals_np

        u_star, _ = oracle_duals_np(C)
        du = u_np - u_star
        maes.append(float(np.mean(np.abs(du - du.mean()))))
    assert np.median(gaps) < 5.0, gaps
    assert np.median(dgaps) < 1.0, dgaps
    # residual vs the stored oracle point is dual-polytope non-uniqueness;
    # bound it loosely to catch regressions
    assert np.mean(maes) < 0.025, maes


def test_sentinel_family_feasible_on_true_matrix():
    """Refinement runs on the sentinel-clipped matrix but the returned pair
    must be feasible for the TRUE 1e6-sentinel matrix."""
    n = 64
    C = FAMILIES["sparse"](n, np.random.default_rng(3))
    assert C.max() >= 1e5  # the family actually has sentinels
    Cd = jnp.asarray(C, jnp.float32)[None]
    u0, _ = rank1_duals(Cd)
    u, v = sinkhorn_refine(Cd, u0)
    assert _feasible(C, np.asarray(u[0], np.float64), np.asarray(v[0], np.float64), tol=1.0)


def test_collision_veto_rejects_interior_seed_on_ties():
    """On a tie-heavy instance the smoothed seed's unique-argmin count
    collapses; with collision_veto the selection keeps the extreme-point
    seed even when the smoothed objective is higher."""
    n = 128
    C = FAMILIES["tie"](n, np.random.default_rng(7))
    Cd = jnp.asarray(C, jnp.float32)[None]
    from lapgnn_tpu.ops.host_dual import oracle_duals_np

    u_star, v_star = oracle_duals_np(C)
    u_o = jnp.asarray(u_star, jnp.float32)[None]
    u0, _ = rank1_duals(Cd)
    u_sk, v_sk = sinkhorn_refine(Cd, u0)

    uo_uniq = int(uniq_argmin_count(Cd, u_o, jnp.min(Cd - u_o[..., :, None], axis=-2))[0])
    sk_uniq = int(uniq_argmin_count(Cd, u_sk, v_sk)[0])
    assert sk_uniq < uo_uniq - n // 4, (sk_uniq, uo_uniq)
    # With the veto the low-collision extreme-point seed survives selection.
    u_sel, _ = select_best_seed(Cd, (u_o, u_sk), collision_veto=True)
    np.testing.assert_allclose(
        np.asarray(u_sel[0]), np.asarray(u_o[0]), atol=1e-6
    )


def test_collision_veto_selection_rule():
    """Constructed two-candidate case: candidate B ties candidate A on the
    dual objective (both optimal) but funnels every row's argmin into one
    column (uniq=1).  Objective-only selection returns B (argmax takes the
    first maximum); the veto disqualifies it and returns A."""
    C = np.array(
        [[0.0, 9.0, 9.0, 9.0],
         [0.1, 0.0, 9.0, 9.0],
         [0.1, 9.0, 0.0, 9.0],
         [0.1, 9.0, 9.0, 0.0]],
        np.float64,
    )
    Cd = jnp.asarray(C, jnp.float32)[None]
    u_B = jnp.asarray([0.0, 0.1, 0.1, 0.1], jnp.float32)[None]  # uniq = 1
    u_A = jnp.zeros((1, 4), jnp.float32)                        # uniq = 4
    from lapgnn_tpu.ops.dual import min_trick_v

    assert int(uniq_argmin_count(Cd, u_B, min_trick_v(Cd, u_B))[0]) == 1
    assert int(uniq_argmin_count(Cd, u_A, min_trick_v(Cd, u_A))[0]) == 4

    u_raw, _ = select_best_seed(Cd, (u_B, u_A))
    np.testing.assert_allclose(np.asarray(u_raw[0]), np.asarray(u_B[0]), atol=1e-6)
    u_veto, _ = select_best_seed(Cd, (u_B, u_A), collision_veto=True)
    np.testing.assert_allclose(np.asarray(u_veto[0]), np.asarray(u_A[0]), atol=1e-6)


def test_batched_and_jittable():
    import jax

    C = jnp.asarray(
        np.stack([FAMILIES["uniform"](32, np.random.default_rng(s)) for s in range(3)]),
        jnp.float32,
    )
    u0 = jnp.zeros((3, 32), jnp.float32)
    f = jax.jit(sinkhorn_refine)
    u, v = f(C, u0)
    assert u.shape == (3, 32) and v.shape == (3, 32)
    red = C - u[..., :, None] - v[..., None, :]
    assert float(jnp.min(red)) >= -1e-4


def test_pipeline_auto_serves_refined_seed_on_noisy_linear():
    """End-to-end: predict_duals_fn('auto') on noisy_linear returns duals
    with a near-zero dual gap (the refined candidate won selection)."""
    import jax

    from lapgnn_tpu.models import OneGNN
    from lapgnn_tpu.ops.features import row_features
    from lapgnn_tpu.pipeline import predict_duals_fn

    n = 128
    model = OneGNN(hidden=16, layers=1, topk=4)
    C0 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, n, n)), jnp.float32)
    params = model.init(jax.random.key(0), row_features(C0), cost=C0)
    predict = predict_duals_fn(model, use_cost_refinement=True, seed_mode="auto")

    C = generate_noisy_linear_costs(n, noise=0.1, seed=2)
    r, c = scipy.optimize.linear_sum_assignment(C)
    opt = float(C[r, c].sum())
    u, v = predict(params, jnp.asarray(C, jnp.float32)[None])
    dual_gap = opt - float(jnp.sum(u) + jnp.sum(v))
    assert dual_gap < 1.0, dual_gap  # rank-1 alone leaves ~4-9 at this size
