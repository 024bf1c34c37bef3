"""Trainer tests: OneGNN + DualGNN loops actually learn; checkpoints roundtrip."""

import jax
import numpy as np
import pytest

from lapgnn_tpu.data.synthetic import generate_synthetic_instance
from lapgnn_tpu.train.checkpoint import (
    build_model_from_meta,
    load_checkpoint,
    save_checkpoint,
)
from lapgnn_tpu.train.schedule import make_optimizer, warmup_cosine
from lapgnn_tpu.train.trainer import BucketBatcher, TrainConfig, train_one_gnn


@pytest.fixture(scope="module")
def tiny_dataset():
    rng = np.random.default_rng(0)
    insts = []
    for _ in range(12):
        s = generate_synthetic_instance("uniform", 12, rng)
        insts.append({"cost": s.cost, "u": s.u, "v": s.v, "n": 12})
    return insts


def test_bucket_batcher_shapes(tiny_dataset):
    b = BucketBatcher(tiny_dataset, batch_size=5, seed=0)
    batches = list(b)
    assert sum(c.shape[0] for c, _, _ in batches) == 12
    for cost, u, v in batches:
        assert cost.shape[1:] == (12, 12)
        assert u.shape == (cost.shape[0], 12)


@pytest.mark.slow
def test_train_one_gnn_reduces_loss(tiny_dataset):
    cfg = TrainConfig(
        hidden=16, layers=1, epochs=8, batch_size=6, min_epochs=8, patience=3,
        lr=3e-3, dropout=0.0,
    )
    params, history = train_one_gnn(tiny_dataset, None, cfg, log_fn=lambda s: None)
    losses = history["train_loss"]
    assert len(losses) == 8
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


@pytest.mark.slow
def test_train_with_validation_early_stop(tiny_dataset):
    cfg = TrainConfig(
        hidden=16, layers=1, epochs=4, batch_size=6, min_epochs=1, patience=1,
        dropout=0.0,
    )
    params, history = train_one_gnn(
        tiny_dataset[:8], tiny_dataset[8:], cfg, log_fn=lambda s: None
    )
    assert len(history["val_gap_median"]) >= 1


def test_warmup_cosine_shape():
    sched = warmup_cosine(1e-3, warmup_steps=10, total_steps=100, min_lr=1e-5)
    assert float(sched(0)) < 1e-4
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert float(sched(100)) <= 1e-4


def test_checkpoint_roundtrip(tmp_path, tiny_dataset):
    import jax.numpy as jnp

    from lapgnn_tpu.models import OneGNN
    from lapgnn_tpu.ops.features import row_features

    model = OneGNN(hidden=16, layers=1)
    C = jnp.asarray(tiny_dataset[0]["cost"][None], jnp.float32)
    params = model.init(jax.random.key(0), row_features(C), cost=C)
    meta = {"architecture": "one_gnn", "hidden": 16, "layers": 1, "topk": 16,
            "dropout": 0.1}
    save_checkpoint(tmp_path / "ckpt", jax.device_get(params), meta)

    params2, meta2, _ = load_checkpoint(tmp_path / "ckpt")
    model2 = build_model_from_meta(meta2)
    out1 = model.apply(params, row_features(C), cost=C)
    out2 = model2.apply(params2, row_features(C), cost=C)
    np.testing.assert_allclose(
        np.asarray(out1["u"]), np.asarray(out2["u"]), atol=1e-6
    )


def test_checkpoint_dual_gnn_meta_roundtrip(tmp_path):
    from lapgnn_tpu.models import DualGNN

    meta = {"architecture": "dual_gnn", "hidden": 32, "layers": 2, "heads": 4}
    model = build_model_from_meta(meta)
    assert isinstance(model, DualGNN)
    assert model.hidden_dim == 32


@pytest.mark.slow
def test_dual_trainer_single_epoch():
    from lapgnn_tpu.train.dual_trainer import DualTrainConfig, train_dual_gnn

    rng = np.random.default_rng(1)
    insts = []
    for _ in range(4):
        s = generate_synthetic_instance("uniform", 8, rng)
        insts.append({"cost": s.cost, "u": s.u, "v": s.v, "n": 8})
    cfg = DualTrainConfig(hidden=16, layers=1, heads=2, epochs=2, batch_size=4,
                          dropout=0.0)
    params, history = train_dual_gnn(insts, None, cfg, log_fn=lambda s: None)
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(l) for l in history["train_loss"])


def test_merge_params_warm_init():
    """strict=False overlay (reference train_progressive_clean.py:461-473):
    matching-path+shape leaves come from the checkpoint, everything else keeps
    the fresh init; counts report coverage."""
    import numpy as np

    from lapgnn_tpu.train.checkpoint import merge_params

    fresh = {
        "a": {"w": np.zeros((3, 3)), "b": np.zeros((3,))},
        "new_block": {"w": np.zeros((2, 2))},
        "head": {"w": np.zeros((4,))},
    }
    loaded = {
        "a": {"w": np.ones((3, 3)), "b": np.ones((3,))},
        "head": {"w": np.ones((5,))},  # shape mismatch -> keep fresh
        "stale": {"w": np.ones((9,))},  # not in fresh -> dropped
    }
    merged, n_loaded, n_total = merge_params(fresh, loaded)
    assert n_total == 4 and n_loaded == 2
    np.testing.assert_array_equal(merged["a"]["w"], 1.0)
    np.testing.assert_array_equal(merged["a"]["b"], 1.0)
    np.testing.assert_array_equal(merged["new_block"]["w"], 0.0)
    np.testing.assert_array_equal(merged["head"]["w"], np.zeros((4,)))
    assert "stale" not in merged


@pytest.mark.slow
def test_dual_trainer_sharded_mesh():
    """train_dual_gnn(mesh=...) routes through the 2-D edge-partitioned
    train/eval steps (parallel/dual.py) — the fine-tune entry that lifts
    the reference's single-device n<=2048 DualGNN cap."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from lapgnn_tpu.parallel.dual import dual_mesh
    from lapgnn_tpu.train.dual_trainer import DualTrainConfig, train_dual_gnn

    rng = np.random.default_rng(2)
    insts = []
    for _ in range(4):
        s = generate_synthetic_instance("uniform", 16, rng)
        insts.append({"cost": s.cost, "u": s.u, "v": s.v, "n": 16})
    cfg = DualTrainConfig(hidden=16, layers=1, heads=2, epochs=2, batch_size=4,
                          dropout=0.0, min_epochs=1)
    params, history = train_dual_gnn(
        insts, insts, cfg, log_fn=lambda s: None, mesh=dual_mesh(row=4, col=2)
    )
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(l) for l in history["train_loss"])
    assert all(np.isfinite(g) for g in history["val_gap_median"])


@pytest.mark.slow
def test_dual_trainer_warm_init():
    """init_params fine-tunes from an existing checkpoint's params."""
    from lapgnn_tpu.train.dual_trainer import DualTrainConfig, train_dual_gnn

    rng = np.random.default_rng(3)
    insts = []
    for _ in range(4):
        s = generate_synthetic_instance("uniform", 8, rng)
        insts.append({"cost": s.cost, "u": s.u, "v": s.v, "n": 8})
    cfg = DualTrainConfig(hidden=16, layers=1, heads=2, epochs=1,
                          batch_size=4, dropout=0.0)
    params0, _ = train_dual_gnn(insts, None, cfg, log_fn=lambda s: None)
    params1, history = train_dual_gnn(
        insts, None, cfg, log_fn=lambda s: None, init_params=params0
    )
    assert np.isfinite(history["train_loss"][0])
