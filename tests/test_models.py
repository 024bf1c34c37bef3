"""Model tests: OneGNN / DualGNN shapes, gauge, masking, refinement path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.models import DualGNN, OneGNN
from lapgnn_tpu.ops.features import graph_features, row_features


@pytest.fixture(scope="module")
def one_gnn_setup():
    rng = np.random.default_rng(0)
    C = np.stack([FAMILIES["uniform"](24, rng) for _ in range(2)]).astype(np.float32)
    feats = row_features(jnp.asarray(C))
    model = OneGNN(hidden=32, layers=2, dropout=0.1, topk=8)
    params = model.init(jax.random.key(0), feats, cost=jnp.asarray(C))
    return model, params, feats, jnp.asarray(C)


def test_one_gnn_output_shape_and_gauge(one_gnn_setup):
    model, params, feats, C = one_gnn_setup
    out = model.apply(params, feats, cost=C)
    u = np.asarray(out["u"])
    assert u.shape == (2, 24)
    np.testing.assert_allclose(u.mean(axis=1), 0.0, atol=1e-5)


def test_one_gnn_without_cost_skips_refinement(one_gnn_setup):
    model, params, feats, C = one_gnn_setup
    out_plain = model.apply(params, feats)
    out_ref = model.apply(params, feats, cost=C)
    # The refinement must actually change the output.
    assert not np.allclose(np.asarray(out_plain["u"]), np.asarray(out_ref["u"]))


def test_one_gnn_mask_zeroes_invalid(one_gnn_setup):
    model, params, feats, C = one_gnn_setup
    mask = jnp.asarray(np.array([[True] * 20 + [False] * 4, [True] * 24]))
    out = model.apply(params, feats, cost=C, mask=mask)
    u = np.asarray(out["u"])
    np.testing.assert_allclose(u[0, 20:], 0.0)


def test_one_gnn_dropout_stochastic(one_gnn_setup):
    model, params, feats, C = one_gnn_setup
    out1 = model.apply(
        params, feats, cost=C, deterministic=False,
        rngs={"dropout": jax.random.key(1)},
    )
    out2 = model.apply(
        params, feats, cost=C, deterministic=False,
        rngs={"dropout": jax.random.key(2)},
    )
    assert not np.allclose(np.asarray(out1["u"]), np.asarray(out2["u"]))


def test_one_gnn_jit_and_grad(one_gnn_setup):
    model, params, feats, C = one_gnn_setup

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, feats, cost=C)
        return jnp.sum(out["u"] ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


@pytest.fixture(scope="module")
def dual_gnn_setup():
    rng = np.random.default_rng(1)
    C = np.stack([FAMILIES["uniform"](12, rng) for _ in range(2)]).astype(np.float32)
    gf = graph_features(jnp.asarray(C))
    model = DualGNN(hidden_dim=32, layers=2, heads=4, dropout=0.0)
    params = model.init(jax.random.key(0), gf.edge_feat, gf.row_feat, gf.col_feat)
    return model, params, gf


def test_dual_gnn_shapes_and_gauge(dual_gnn_setup):
    model, params, gf = dual_gnn_setup
    out = model.apply(params, gf.edge_feat, gf.row_feat, gf.col_feat)
    u = np.asarray(out["u"])
    v = np.asarray(out["v_hint"])
    assert u.shape == (2, 12) and v.shape == (2, 12)
    np.testing.assert_allclose(u.mean(axis=1), 0.0, atol=1e-5)


def test_dual_gnn_mask(dual_gnn_setup):
    model, params, gf = dual_gnn_setup
    mask = jnp.asarray(np.array([[True] * 9 + [False] * 3, [True] * 12]))
    out = model.apply(params, gf.edge_feat, gf.row_feat, gf.col_feat, mask)
    np.testing.assert_allclose(np.asarray(out["u"])[0, 9:], 0.0)
    np.testing.assert_allclose(np.asarray(out["v_hint"])[0, 9:], 0.0)


@pytest.mark.slow
def test_dual_gnn_grad(dual_gnn_setup):
    model, params, gf = dual_gnn_setup

    def loss_fn(p):
        out = model.apply(p, gf.edge_feat, gf.row_feat, gf.col_feat)
        return jnp.sum(out["u"] ** 2) + jnp.sum(out["v_hint"] ** 2)

    g = jax.grad(loss_fn)(params)
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.slow
def test_dual_gnn_remat_matches_and_differentiates(rng):
    from lapgnn_tpu.train.loss import dual_gnn_loss

    C = np.stack([FAMILIES["uniform"](10, rng) for _ in range(2)]).astype(np.float32)
    gf = graph_features(jnp.asarray(C))
    plain = DualGNN(hidden_dim=16, layers=2, heads=2, dropout=0.0)
    rm = DualGNN(hidden_dim=16, layers=2, heads=2, dropout=0.0, remat=True)
    params = plain.init(jax.random.key(3), gf.edge_feat, gf.row_feat, gf.col_feat)

    out_a = plain.apply(params, gf.edge_feat, gf.row_feat, gf.col_feat)
    out_b = rm.apply(params, gf.edge_feat, gf.row_feat, gf.col_feat)
    np.testing.assert_allclose(
        np.asarray(out_a["u"]), np.asarray(out_b["u"]), atol=1e-6
    )

    def loss(p):
        preds = rm.apply(p, gf.edge_feat, gf.row_feat, gf.col_feat)
        l, _ = dual_gnn_loss(jnp.asarray(C), preds)
        return l

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_one_gnn_context_shapes_and_padding_gauge(one_gnn_setup):
    """DeepSets context (net-new): padded batch == unpadded up to gauge shift.

    The pooled mean/max exclude padded rows, so a context-enabled model run on
    a zero-padded instance must produce the same duals as the unpadded run up
    to the mean-centering gauge constant (centering spans all rows including
    padding, matching the reference's global-center quirk).
    """
    _, _, feats, C = one_gnn_setup
    model = OneGNN(hidden=32, layers=2, dropout=0.1, topk=8, context=True)
    params = model.init(jax.random.key(7), feats, cost=C)
    out = model.apply(params, feats, cost=C)
    assert np.asarray(out["u"]).shape == (2, 24)
    # context params exist
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("ctx_fc1" in jax.tree_util.keystr(p) for p, _ in flat)

    n, pad = 16, 24
    rng = np.random.default_rng(3)
    Cn = FAMILIES["uniform"](n, rng).astype(np.float32)
    fu = row_features(jnp.asarray(Cn)[None])  # (1, n, 21)
    fp = jnp.zeros((1, pad, fu.shape[-1]), jnp.float32).at[:, :n].set(fu)
    mask = jnp.arange(pad)[None, :] < n
    u_un = np.asarray(model.apply(params, fu)["u"])[0]
    u_pd = np.asarray(model.apply(params, fp, mask=mask)["u"])[0, :n]
    d = u_pd - u_un
    np.testing.assert_allclose(d - d.mean(), 0.0, atol=1e-4)


def test_one_gnn_context_changes_output(one_gnn_setup):
    """context=False params are a strict subtree: merged warm-init differs."""
    _, _, feats, C = one_gnn_setup
    base = OneGNN(hidden=32, layers=2, dropout=0.1, topk=8, context=False)
    ctx = OneGNN(hidden=32, layers=2, dropout=0.1, topk=8, context=True)
    pb = base.init(jax.random.key(0), feats, cost=C)
    pc = ctx.init(jax.random.key(0), feats, cost=C)
    out_b = base.apply(pb, feats, cost=C)
    out_c = ctx.apply(pc, feats, cost=C)
    assert not np.allclose(np.asarray(out_b["u"]), np.asarray(out_c["u"]))


def test_one_gnn_topk_impl_parity(one_gnn_setup):
    """topk_impl='iter' (the GSPMD-shardable variant) is value-identical to
    lax.top_k through the whole model, including tie-heavy costs."""
    _, _, feats, C = one_gnn_setup
    # tie-heavy: duplicate two columns
    Ct = np.asarray(C).copy()
    Ct[..., 3] = Ct[..., 4]
    Ct = jnp.asarray(Ct)
    a = OneGNN(hidden=32, layers=2, dropout=0.1, topk=8, topk_impl="top_k")
    b = OneGNN(hidden=32, layers=2, dropout=0.1, topk=8, topk_impl="iter")
    params = a.init(jax.random.key(1), feats, cost=Ct)
    ua = a.apply(params, feats, cost=Ct)["u"]
    ub = b.apply(params, feats, cost=Ct)["u"]
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))


def test_dual_gnn_predictor_seed_modes(rng):
    """DualGNNPredictor mirrors the pipeline's seed auto-selection so the
    accuracy ladder compares models under the same serving posture: 'auto'
    must never be worse (by projected dual objective) than either candidate
    alone."""
    import jax.numpy as jnp

    from lapgnn_tpu.evaluation import DualGNNPredictor
    from lapgnn_tpu.models import DualGNN
    from lapgnn_tpu.ops.features import graph_features

    n = 24
    # rank-1-dominant instance: the analytic seed should win the selection
    a = rng.random(n)[:, None]
    b = rng.random(n)[None, :]
    C = (a + b + 0.01 * rng.random((n, n))).astype(np.float32)[None]

    model = DualGNN(hidden_dim=16, layers=1, heads=2, dropout=0.0)
    gf = graph_features(jnp.asarray(C))
    params = model.init(
        jax.random.key(0), gf.edge_feat, gf.row_feat, gf.col_feat
    )

    def objective(u, v):
        return float(jnp.sum(u) + jnp.sum(v))

    scores = {}
    for mode in ("gnn", "rank1", "auto"):
        u, v = DualGNNPredictor(model, params, seed_mode=mode).predict_duals(
            jnp.asarray(C)
        )
        assert u.shape == (1, n) and v.shape == (1, n)
        # feasibility of the projected duals: u_i + v_j <= C_ij (+eps)
        slack = np.asarray(C)[0] - np.asarray(u)[0][:, None] - np.asarray(v)[0][None, :]
        assert slack.min() > -1e-4
        scores[mode] = objective(u, v)

    assert scores["auto"] >= max(scores["gnn"], scores["rank1"]) - 1e-5
    with pytest.raises(ValueError):
        DualGNNPredictor(model, params, seed_mode="bogus")
