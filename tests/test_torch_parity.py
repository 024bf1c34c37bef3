"""Activation parity vs the PyTorch reference models.

Loads the reference's torch OneGNN/DualGNN (read-only from /root/reference),
copies this framework's flax parameters into them, and asserts the outputs
match (allclose) on identical inputs — the north-star per-layer parity check
(BASELINE.json).  Skipped when torch or the reference checkout is absent.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference checkout unavailable", allow_module_level=True)

sys.path.insert(0, str(REF))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lapgnn_tpu.models import DualGNN, OneGNN  # noqa: E402
from lapgnn_tpu.ops.features import graph_features, row_features  # noqa: E402

pytestmark = pytest.mark.slow  # loads torch + builds reference models (~30 s)


def _t(x):
    return torch.from_numpy(np.array(x, np.float32, copy=True))


def _linear(torch_linear, p):
    torch_linear.weight.data = _t(p["kernel"]).T.contiguous()
    if torch_linear.bias is not None and "bias" in p:
        torch_linear.bias.data = _t(p["bias"])


def _layernorm(torch_ln, p):
    torch_ln.weight.data = _t(p["scale"])
    torch_ln.bias.data = _t(p["bias"])


def test_one_gnn_activation_parity(rng):
    from gnn.one_gnn import OneGNN as TorchOneGNN

    B, n, F, hidden, layers = 2, 24, 21, 32, 2
    model = OneGNN(hidden=hidden, layers=layers, dropout=0.0, topk=8)
    cost = jnp.asarray(rng.uniform(0, 1, (B, n, n)), jnp.float32)
    feats = row_features(cost)
    params = model.init(jax.random.key(0), feats, cost=cost)["params"]

    tm = TorchOneGNN(in_dim=F, hidden=hidden, layers=layers, dropout=0.0, topk=8)
    tm.eval()
    _linear(tm.input_proj[0], params["input_proj"])
    _layernorm(tm.input_proj[2], params["input_norm"])
    for i in range(layers):
        blk = params[f"block_{i}"]
        _linear(tm.blocks[i].fc1, blk["fc1"])
        _linear(tm.blocks[i].fc2, blk["fc2"])
        _layernorm(tm.blocks[i].norm, blk["norm"])
    _linear(tm.pre_out, params["pre_out"])
    _linear(tm.row_out[0], params["head_fc1"])
    _linear(tm.row_out[3], params["head_fc2"])
    _linear(tm.edge_mlp[0], params["edge_fc1"])
    _linear(tm.edge_mlp[2], params["edge_fc2"])
    _layernorm(tm.message_norm, params["message_norm"])

    out_jax = model.apply({"params": params}, feats, cost=cost)
    with torch.no_grad():
        out_torch = tm(_t(feats), cost=_t(cost))

    np.testing.assert_allclose(
        np.asarray(out_jax["u"]), out_torch["u"].numpy(), atol=2e-5, rtol=1e-4
    )


def test_one_gnn_parity_without_refinement(rng):
    from gnn.one_gnn import OneGNN as TorchOneGNN

    B, n, hidden = 1, 16, 16
    model = OneGNN(hidden=hidden, layers=1, dropout=0.0, topk=4)
    cost = jnp.asarray(rng.uniform(0, 1, (B, n, n)), jnp.float32)
    feats = row_features(cost)
    params = model.init(jax.random.key(1), feats, cost=cost)["params"]

    tm = TorchOneGNN(in_dim=21, hidden=hidden, layers=1, dropout=0.0, topk=4)
    tm.eval()
    _linear(tm.input_proj[0], params["input_proj"])
    _layernorm(tm.input_proj[2], params["input_norm"])
    _linear(tm.blocks[0].fc1, params["block_0"]["fc1"])
    _linear(tm.blocks[0].fc2, params["block_0"]["fc2"])
    _layernorm(tm.blocks[0].norm, params["block_0"]["norm"])
    _linear(tm.pre_out, params["pre_out"])
    _linear(tm.row_out[0], params["head_fc1"])
    _linear(tm.row_out[3], params["head_fc2"])
    _linear(tm.edge_mlp[0], params["edge_fc1"])
    _linear(tm.edge_mlp[2], params["edge_fc2"])
    _layernorm(tm.message_norm, params["message_norm"])

    out_jax = model.apply({"params": params}, feats)  # no cost: refine off
    with torch.no_grad():
        out_torch = tm(_t(feats))
    np.testing.assert_allclose(
        np.asarray(out_jax["u"]), out_torch["u"].numpy(), atol=2e-5, rtol=1e-4
    )


def test_dual_gnn_activation_parity(rng):
    from gnn.dual_gnn import DualGNN as TorchDualGNN

    B, n, hidden, layers, heads = 1, 10, 16, 2, 4
    hd = hidden // heads
    model = DualGNN(hidden_dim=hidden, layers=layers, heads=heads, dropout=0.0)
    cost = jnp.asarray(rng.uniform(0, 1, (B, n, n)), jnp.float32)
    gf = graph_features(cost)
    params = model.init(
        jax.random.key(2), gf.edge_feat, gf.row_feat, gf.col_feat
    )["params"]

    tm = TorchDualGNN(hidden_dim=hidden, layers=layers, heads=heads, dropout=0.0)
    tm.eval()
    _linear(tm.row_encoder[0], params["row_encoder_fc"])
    _layernorm(tm.row_encoder[2], params["row_encoder_norm"])
    _linear(tm.col_encoder[0], params["col_encoder_fc"])
    _layernorm(tm.col_encoder[2], params["col_encoder_norm"])
    _linear(tm.row_out, params["row_out"])
    _linear(tm.col_out, params["col_out"])

    for i in range(layers):
        lp = params[f"layer_{i}"]
        tl = tm.layers[i]
        _linear(tl.edge_mlp[0], lp["edge_fc1"])
        _linear(tl.edge_mlp[3], lp["edge_fc2"])
        _linear(tl.edge_mlp[5], lp["edge_fc3"])
        _linear(tl.row_proj, lp["row_proj"])
        _linear(tl.col_proj, lp["col_proj"])
        _linear(tl.row_val, lp["row_val"])
        _linear(tl.col_val, lp["col_val"])
        # flax stores attention weights as (heads, 3, head_dim); torch
        # concatenates the thirds along the last axis: (heads, 3 * head_dim).
        tl.attn_row_weight.data = _t(lp["attn_row"]).reshape(heads, 3 * hd)
        tl.attn_col_weight.data = _t(lp["attn_col"]).reshape(heads, 3 * hd)
        tl.attn_row_bias.data = _t(lp["attn_row_bias"])
        tl.attn_col_bias.data = _t(lp["attn_col_bias"])
        _linear(tl.row_update[0], lp["row_update"])
        _linear(tl.col_update[0], lp["col_update"])
        _layernorm(tl.row_norm, lp["row_norm"])
        _layernorm(tl.col_norm, lp["col_norm"])

    out_jax = model.apply(
        {"params": params}, gf.edge_feat, gf.row_feat, gf.col_feat
    )
    with torch.no_grad():
        out_torch = tm(_t(gf.edge_feat), _t(gf.row_feat), _t(gf.col_feat))

    np.testing.assert_allclose(
        np.asarray(out_jax["u"]), out_torch["u"].numpy(), atol=5e-5, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_jax["v_hint"]), out_torch["v_hint"].numpy(), atol=5e-5, rtol=1e-3
    )


def test_convert_torch_checkpoint_roundtrip(tmp_path, rng):
    """Save a reference-style torch checkpoint, convert it, verify outputs
    agree with the torch model (weights-level interop)."""
    from gnn.one_gnn import OneGNN as TorchOneGNN

    from lapgnn_tpu.train.convert_torch import convert_checkpoint

    hidden, layers, n = 32, 2, 16
    tm = TorchOneGNN(in_dim=21, hidden=hidden, layers=layers, dropout=0.0, topk=8)
    tm.eval()
    ckpt = {
        "model_state_dict": tm.state_dict(),
        "architecture": "one_gnn",
        "hidden_dim": hidden,
        "layers": layers,
        "dropout": 0.0,
        "row_feat_dim": 21,
        "features": "full",
    }
    path = tmp_path / "ref_model.pt"
    torch.save(ckpt, path)

    params, meta = convert_checkpoint(path)
    assert meta["architecture"] == "one_gnn"
    model = OneGNN(hidden=hidden, layers=layers, dropout=0.0, topk=8)

    cost = jnp.asarray(rng.uniform(0, 1, (1, n, n)), jnp.float32)
    feats = row_features(cost)
    out_jax = model.apply(params, feats, cost=cost)
    with torch.no_grad():
        out_torch = tm(_t(feats), cost=_t(cost))
    np.testing.assert_allclose(
        np.asarray(out_jax["u"]), out_torch["u"].numpy(), atol=2e-5, rtol=1e-4
    )


def test_convert_bare_state_dict(tmp_path):
    from gnn.one_gnn import OneGNN as TorchOneGNN

    from lapgnn_tpu.train.convert_torch import convert_checkpoint

    tm = TorchOneGNN(in_dim=21, hidden=64, layers=2)
    path = tmp_path / "bare.pt"
    torch.save(tm.state_dict(), path)
    params, meta = convert_checkpoint(path)
    assert meta["hidden"] == 64 and "block_1" in params["params"]


def test_convert_untagged_dual_gnn_and_progressive_config(tmp_path):
    """Reference DualGNN checkpoints carry NO architecture tag
    (train.py:405-415) and progressive checkpoints store the model section
    directly under 'config' with 'hidden_dim' keys — both previously
    misrouted (DualGNN -> KeyError as OneGNN; progressive -> silent 64/2
    defaults dropping layers). dropout=0.0 must also survive (falsy-zero)."""
    from gnn.dual_gnn import DualGNN as TorchDualGNN
    from gnn.one_gnn import OneGNN as TorchOneGNN

    from lapgnn_tpu.train.convert_torch import convert_checkpoint

    # untagged DualGNN (reference schema)
    dm = TorchDualGNN(hidden_dim=32, layers=2, heads=4, dropout=0.0)
    path = tmp_path / "dual_untagged.pt"
    torch.save(
        {"model_state_dict": dm.state_dict(), "hidden_dim": 32,
         "layers": 2, "heads": 4, "dropout": 0.0},
        path,
    )
    params, meta = convert_checkpoint(path)
    assert meta["architecture"] == "dual_gnn"
    assert meta["dropout"] == 0.0
    assert "layer_1" in params["params"]

    # progressive schema: config IS the model section, hidden_dim spelling
    tm = TorchOneGNN(in_dim=21, hidden=48, layers=3, dropout=0.0, topk=8)
    path2 = tmp_path / "progressive.pt"
    torch.save(
        {"model_state_dict": tm.state_dict(),
         "config": {"hidden_dim": 48, "layers": 3, "dropout": 0.0}},
        path2,
    )
    params2, meta2 = convert_checkpoint(path2)
    assert meta2["hidden"] == 48 and meta2["layers"] == 3
    assert meta2["dropout"] == 0.0
    assert "block_2" in params2["params"]
