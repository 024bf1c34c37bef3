"""Convert reference PyTorch checkpoints into lapgnn_tpu flax parameters.

The reference saves torch ``state_dict`` checkpoints in three schemas
(SURVEY.md §5; scripts/gnn_benchmark.py:80-130 sniffs them).  This module
maps those tensors onto this framework's flax parameter trees so weights
trained with the reference can run on TPU unchanged (activation parity is
verified by tests/test_torch_parity.py — same math, transposed kernels).

Usage:
  params, meta = convert_one_gnn_state_dict(state_dict, hidden=64, layers=2)
  params, meta = convert_checkpoint("model_best.pt")     # schema-sniffing
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "convert_one_gnn_state_dict",
    "convert_dual_gnn_state_dict",
    "convert_checkpoint",
]


def _lin(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _to_numpy_state_dict(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, t in sd.items():
        out[k] = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    return out


def convert_one_gnn_state_dict(
    state_dict, hidden: int, layers: int
) -> Dict[str, Any]:
    """Torch OneGNN state_dict (one_gnn.py:50-87 layout) -> flax params."""
    sd = _to_numpy_state_dict(state_dict)
    params: Dict[str, Any] = {
        "input_proj": _lin(sd, "input_proj.0"),
        "input_norm": _ln(sd, "input_proj.2"),
        "pre_out": _lin(sd, "pre_out"),
        "head_fc1": _lin(sd, "row_out.0"),
        "head_fc2": _lin(sd, "row_out.3"),
        "edge_fc1": _lin(sd, "edge_mlp.0"),
        "edge_fc2": _lin(sd, "edge_mlp.2"),
        "message_norm": _ln(sd, "message_norm"),
    }
    for i in range(layers):
        params[f"block_{i}"] = {
            "fc1": _lin(sd, f"blocks.{i}.fc1"),
            "fc2": _lin(sd, f"blocks.{i}.fc2"),
            "norm": _ln(sd, f"blocks.{i}.norm"),
        }
    return {"params": params}


def convert_dual_gnn_state_dict(
    state_dict, hidden: int, layers: int, heads: int
) -> Dict[str, Any]:
    """Torch DualGNN state_dict (dual_gnn.py:17-175 layout) -> flax params."""
    sd = _to_numpy_state_dict(state_dict)
    hd = hidden // heads
    params: Dict[str, Any] = {
        "row_encoder_fc": _lin(sd, "row_encoder.0"),
        "row_encoder_norm": _ln(sd, "row_encoder.2"),
        "col_encoder_fc": _lin(sd, "col_encoder.0"),
        "col_encoder_norm": _ln(sd, "col_encoder.2"),
        "row_out": _lin(sd, "row_out"),
        "col_out": _lin(sd, "col_out"),
    }
    for i in range(layers):
        lp = {
            "edge_fc1": _lin(sd, f"layers.{i}.edge_mlp.0"),
            "edge_fc2": _lin(sd, f"layers.{i}.edge_mlp.3"),
            "edge_fc3": _lin(sd, f"layers.{i}.edge_mlp.5"),
            "row_proj": _lin(sd, f"layers.{i}.row_proj"),
            "col_proj": _lin(sd, f"layers.{i}.col_proj"),
            "row_val": _lin(sd, f"layers.{i}.row_val"),
            "col_val": _lin(sd, f"layers.{i}.col_val"),
            # torch: (heads, 3*head_dim) concat thirds -> flax (heads, 3, hd).
            "attn_row": np.asarray(sd[f"layers.{i}.attn_row_weight"]).reshape(
                heads, 3, hd
            ),
            "attn_col": np.asarray(sd[f"layers.{i}.attn_col_weight"]).reshape(
                heads, 3, hd
            ),
            "attn_row_bias": np.asarray(sd[f"layers.{i}.attn_row_bias"]),
            "attn_col_bias": np.asarray(sd[f"layers.{i}.attn_col_bias"]),
            "row_update": _lin(sd, f"layers.{i}.row_update.0"),
            "col_update": _lin(sd, f"layers.{i}.col_update.0"),
            "row_norm": _ln(sd, f"layers.{i}.row_norm"),
            "col_norm": _ln(sd, f"layers.{i}.col_norm"),
        }
        params[f"layer_{i}"] = lp
    return {"params": params}


def convert_checkpoint(path) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference .pt checkpoint with schema sniffing.

    Handles the three reference schemas (flat OneGNN dict with architecture
    tag, flat DualGNN dict, progressive dict with nested config) plus bare
    state_dicts (assumed OneGNN defaults), mirroring gnn_benchmark.py:80-130.
    Returns (flax_params, meta suitable for build_model_from_meta).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        sd = blob["model_state_dict"]
        cfg = blob.get("config", {}) or {}
        # Progressive checkpoints store the MODEL section directly under
        # 'config' with 'hidden_dim'/'layers' keys
        # (train_progressive_clean.py:601-633); other schemas may nest a
        # 'model' sub-dict.  Accept both shapes and both key spellings.
        model_cfg = cfg.get("model", cfg) if isinstance(cfg, dict) else {}

        def pick(*keys, default=None):
            for container in (blob, model_cfg):
                for k in keys:
                    v = container.get(k)
                    if v is not None:
                        return v
            return default

        arch = pick("architecture")
        if arch is None:
            # Reference DualGNN checkpoints carry NO architecture tag
            # (train.py:405-415); sniff the state dict like the reference
            # does (gnn_benchmark.py:84): DualGNN has bipartite layer keys.
            is_dual = any(k.startswith("layers.0.attn") for k in sd)
            arch = "dual_gnn" if is_dual else "one_gnn"
        hidden = int(pick("hidden_dim", "hidden", default=64))
        layers = int(pick("layers", default=2))
        heads = int(pick("heads", default=4))
        # plain is-None checks: dropout=0.0 is a real value, `or` would
        # silently resurrect the 0.1 default
        dropout = float(pick("dropout", default=0.1))
    else:  # bare state_dict
        sd = blob
        arch, hidden, layers, heads, dropout = "one_gnn", 64, 2, 4, 0.1

    if arch == "one_gnn":
        params = convert_one_gnn_state_dict(sd, hidden, layers)
        meta = {
            "architecture": "one_gnn",
            "hidden": hidden,
            "layers": layers,
            "dropout": dropout,
            "topk": 16,
            "use_cost_refinement": True,
            "converted_from": str(path),
        }
    else:
        params = convert_dual_gnn_state_dict(sd, hidden, layers, heads)
        meta = {
            "architecture": "dual_gnn",
            "hidden": hidden,
            "layers": layers,
            "heads": heads,
            "dropout": dropout,
            "converted_from": str(path),
        }
    return params, meta
