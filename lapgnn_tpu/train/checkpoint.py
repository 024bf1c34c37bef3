"""Checkpointing: params + optimizer state + config metadata.

Replaces the reference's three torch.save schemas (SURVEY.md §5: OneGNN flat
dict train_one_gnn.py:409-420, DualGNN flat dict train.py:405-415, progressive
dict with optimizer/scheduler state train_progressive_clean.py:599-633) with
one directory format:

  <dir>/meta.json      - architecture name, hyperparameters, feature dims,
                         epoch, metrics (human-readable, greppable)
  <dir>/params.msgpack - flax.serialization bytes of the param pytree
  <dir>/opt_state.msgpack (optional) - optimizer state for resume

``load_checkpoint`` sniffs ``meta.json['architecture']`` to rebuild the right
model, mirroring the reference's checkpoint-schema sniffing
(scripts/gnn_benchmark.py:80-130).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "build_model_from_meta"]


def save_checkpoint(
    path,
    params,
    meta: Dict[str, Any],
    opt_state=None,
) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "meta.json").write_text(json.dumps(meta, indent=2, default=str))
    (path / "params.msgpack").write_bytes(serialization.to_bytes(params))
    if opt_state is not None:
        (path / "opt_state.msgpack").write_bytes(serialization.to_bytes(opt_state))


def load_checkpoint(
    path, params_template=None, opt_state_template=None
) -> Tuple[Any, Dict[str, Any], Optional[Any]]:
    """Returns (params, meta, opt_state_or_None).

    If a template pytree is given the bytes are restored into its structure;
    otherwise a raw nested-dict restore is returned.
    """
    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    raw = (path / "params.msgpack").read_bytes()
    if params_template is not None:
        params = serialization.from_bytes(params_template, raw)
    else:
        params = serialization.msgpack_restore(raw)
    opt_state = None
    opt_path = path / "opt_state.msgpack"
    if opt_path.exists() and opt_state_template is not None:
        opt_state = serialization.from_bytes(opt_state_template, opt_path.read_bytes())
    return params, meta, opt_state


def merge_params(fresh, loaded):
    """Warm-init merge with ``strict=False`` semantics
    (reference train_progressive_clean.py:461-473): overlay onto a freshly
    initialised tree every leaf of ``loaded`` whose path exists in ``fresh``
    with a matching shape; keep the fresh initialisation for everything else
    (new submodules, changed heads).  Returns (merged, n_loaded, n_total)."""
    import numpy as _np

    n_loaded = 0
    n_total = 0

    def _walk(f, l):
        nonlocal n_loaded, n_total
        if isinstance(f, dict):
            out = {}
            for k, v in f.items():
                if isinstance(l, dict) and k in l:
                    out[k] = _walk(v, l[k])
                else:
                    out[k] = _count(v)
            return out
        n_total += 1
        if (
            hasattr(f, "shape")
            and hasattr(l, "shape")
            and tuple(_np.shape(f)) == tuple(_np.shape(l))
        ):
            n_loaded += 1
            return l
        return f

    def _count(v):
        nonlocal n_total
        if isinstance(v, dict):
            return {k: _count(x) for k, x in v.items()}
        n_total += 1
        return v

    return _walk(fresh, loaded), n_loaded, n_total


def build_model_from_meta(meta: Dict[str, Any]):
    """Rebuild a model instance from checkpoint metadata (schema sniffing)."""
    arch = meta.get("architecture", "one_gnn")
    if arch == "one_gnn":
        from ..models import OneGNN

        return OneGNN(
            hidden=int(meta.get("hidden", 64)),
            layers=int(meta.get("layers", 2)),
            dropout=float(meta.get("dropout", 0.1)),
            topk=int(meta.get("topk", 16)),
            context=bool(meta.get("context", False)),
        )
    if arch == "dual_gnn":
        from ..models import DualGNN

        return DualGNN(
            hidden_dim=int(meta.get("hidden", 128)),
            layers=int(meta.get("layers", 4)),
            heads=int(meta.get("heads", 4)),
            dropout=float(meta.get("dropout", 0.1)),
        )
    raise ValueError(f"unknown architecture in checkpoint meta: {arch}")
