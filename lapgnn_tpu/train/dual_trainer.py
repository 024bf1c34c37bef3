"""DualGNN training loop (the accuracy gold standard).

Re-designs ``/root/reference/gnn/train.py:229-419``: same skeleton as the
OneGNN trainer but the model consumes dense graph features (14-D nodes +
10-channel edges) and the loss regularises v_hint against the min-trick
projection (train.py:299-301).  Edge features are computed on device inside
the jitted step, removing the reference's CPU collate bottleneck
(train.py:64-95).  O(n^2 * hidden) memory — intended for n <= 2048.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import DualGNN
from ..ops.features import graph_features
from .loss import dual_gnn_loss
from .schedule import make_optimizer, warmup_cosine
from .trainer import BucketBatcher, State

__all__ = ["DualTrainConfig", "make_dual_train_step", "train_dual_gnn"]


@dataclasses.dataclass
class DualTrainConfig:
    hidden: int = 128
    layers: int = 4
    heads: int = 4
    dropout: float = 0.1
    lr: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    warmup_frac: float = 0.1
    epochs: int = 10
    batch_size: int = 8
    min_epochs: int = 5
    patience: int = 6
    seed: int = 0
    # Sentinel-clipped, size-normalised loss (train/loss.py): the defaults
    # that actually converge on mixed-family data — round-2's run with the
    # raw reference loss sat flat at ~3e5 because sparse instances' 1e6
    # forbidden-edge sentinels dominated the greedy primal bound.
    clip_sentinels: bool = True
    normalize_gap: bool = True
    # Oracle-dual supervision (0.1 * gauge-corrected u-MSE; not in the
    # reference, which trains DualGNN purely unsupervised while giving the
    # OneGNN trainer exactly this term — see train/loss.dual_gnn_loss).
    supervise_duals: bool = True


def make_dual_train_step(
    model: DualGNN,
    tx: optax.GradientTransformation,
    clip_sentinels: bool = True,
    normalize_gap: bool = True,
    supervise_duals: bool = True,
):
    def loss_fn(params, cost, u_target, rng):
        gf = graph_features(cost)
        preds = model.apply(
            params,
            gf.edge_feat,
            gf.row_feat,
            gf.col_feat,
            deterministic=False,
            rngs={"dropout": rng},
        )
        return dual_gnn_loss(
            cost, preds, normalize_gap=normalize_gap,
            clip_sentinels=clip_sentinels,
            u_target=u_target if supervise_duals else None,
        )

    @jax.jit
    def step(state: State, cost, u_target, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, cost, u_target, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return State(params, opt_state, state.step + 1), {
            "loss": loss,
            "primal_gap_mean": jnp.mean(metrics["primal_gap"]),
            "feas_mean": jnp.mean(metrics["feas"]),
            "v_mse_mean": jnp.mean(metrics["v_mse"]),
        }

    return step


def make_dual_eval_step(
    model: DualGNN,
    clip_sentinels: bool = True,
    normalize_gap: bool = True,
):
    @jax.jit
    def step(params, cost):
        gf = graph_features(cost)
        preds = model.apply(params, gf.edge_feat, gf.row_feat, gf.col_feat)
        _, metrics = dual_gnn_loss(
            cost, preds, normalize_gap=normalize_gap,
            clip_sentinels=clip_sentinels,
        )
        return {"primal_gap": metrics["primal_gap"], "feas": metrics["feas"]}

    return step


def train_dual_gnn(
    train_instances: Sequence[Dict[str, np.ndarray]],
    val_instances: Optional[Sequence[Dict[str, np.ndarray]]] = None,
    config: Optional[DualTrainConfig] = None,
    log_fn: Callable[[str], None] = print,
    mesh=None,
    init_params: Optional[dict] = None,
) -> Tuple[dict, Dict[str, list]]:
    """Train (or, with ``init_params``, fine-tune) a DualGNN.

    ``mesh`` (a ('row', 'col') ``jax.sharding.Mesh`` from
    ``parallel.dual.dual_mesh``) switches every step to the 2-D
    edge-partitioned train/eval steps, lifting the single-device
    O(n^2 * hidden) memory cap (the reference guards DualGNN training to
    n <= 2048 for exactly this reason —
    /root/reference/gnn/train_progressive_clean.py:192-194).  Under a mesh
    the loss swaps the greedy primal bound for the dual-maximisation
    surrogate (see parallel.dual.make_sharded_dual_train_step), so logged
    loss/val-gap values are comparable within a run but not against
    unsharded runs.
    """
    cfg = config or DualTrainConfig()
    model = DualGNN(cfg.hidden, cfg.layers, cfg.heads, cfg.dropout)

    batcher = BucketBatcher(train_instances, cfg.batch_size, seed=cfg.seed)
    total_steps = max(1, batcher.num_batches()) * cfg.epochs
    schedule = warmup_cosine(cfg.lr, int(cfg.warmup_frac * total_steps), total_steps)
    tx = make_optimizer(schedule, cfg.weight_decay, cfg.grad_clip)

    n0 = min(batcher.by_size)
    sample = jnp.asarray(batcher.by_size[n0][0]["cost"][None], jnp.float32)
    gf = graph_features(sample)
    key = jax.random.key(cfg.seed)
    params = model.init(key, gf.edge_feat, gf.row_feat, gf.col_feat)
    if init_params is not None:
        from .checkpoint import merge_params

        params, n_loaded, n_total = merge_params(params, init_params)
        log_fn(f"warm init: {n_loaded}/{n_total} param leaves from checkpoint")
    state = State(params, tx.init(params), jnp.asarray(0))

    if mesh is not None:
        from ..parallel.dual import (
            make_sharded_dual_eval_step,
            make_sharded_dual_train_step,
        )

        train_step = make_sharded_dual_train_step(
            model, tx, mesh, clip_sentinels=cfg.clip_sentinels,
            normalize_gap=cfg.normalize_gap,
            supervise_duals=cfg.supervise_duals,
        )
        eval_step = make_sharded_dual_eval_step(
            model, mesh, clip_sentinels=cfg.clip_sentinels,
            normalize_gap=cfg.normalize_gap,
        )
    else:
        train_step = make_dual_train_step(
            model, tx, clip_sentinels=cfg.clip_sentinels,
            normalize_gap=cfg.normalize_gap,
            supervise_duals=cfg.supervise_duals,
        )
        eval_step = make_dual_eval_step(
            model, clip_sentinels=cfg.clip_sentinels,
            normalize_gap=cfg.normalize_gap,
        )

    history: Dict[str, list] = {"train_loss": [], "val_gap_median": []}
    best_params = jax.device_get(state.params)
    best_gap = float("inf")
    bad = 0

    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        losses = []
        for cost, u, v in batcher:
            key, sub = jax.random.split(key)
            state, m = train_step(state, jnp.asarray(cost), jnp.asarray(u), sub)
            losses.append(float(m["loss"]))
        history["train_loss"].append(float(np.mean(losses)) if losses else 0.0)

        if val_instances:
            gaps = []
            for cost, u, v in BucketBatcher(val_instances, cfg.batch_size, seed=0):
                m = eval_step(state.params, jnp.asarray(cost))
                gaps.extend(np.asarray(m["primal_gap"]).tolist())
            gap_med = float(np.median(gaps)) if gaps else float("inf")
            history["val_gap_median"].append(gap_med)
            log_fn(
                f"epoch {epoch}: loss={history['train_loss'][-1]:.4f} "
                f"val_gap_med={gap_med:.4f} ({time.perf_counter() - t0:.1f}s)"
            )
            if gap_med < best_gap - 1e-9:
                best_gap, best_params, bad = gap_med, jax.device_get(state.params), 0
            elif epoch + 1 >= cfg.min_epochs:
                bad += 1
                if bad >= cfg.patience:
                    log_fn(f"early stop at epoch {epoch}")
                    break
        else:
            best_params = jax.device_get(state.params)
            log_fn(f"epoch {epoch}: loss={history['train_loss'][-1]:.4f}")

    return best_params, history
