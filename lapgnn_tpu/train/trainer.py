"""OneGNN training loop: fully on-device steps over size-bucketed batches.

Re-designs ``/root/reference/gnn/train_one_gnn.py:229-421``.  Key TPU-first
changes:
  * the 21-D features are computed *inside* the jitted train step from the
    raw cost batch — the reference computes them per-item in the DataLoader
    collate on a CPU thread (train_one_gnn.py:66-93), its loading bottleneck;
  * the greedy primal upper bound runs on device via ``lax.scan``
    (train/loss.py) — the reference's per-batch GPU->CPU sync bottleneck;
  * batches are size-homogeneous buckets, so every shape traces once.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import OneGNN
from ..ops.features import row_features
from .loss import one_gnn_loss
from .schedule import make_optimizer, warmup_cosine

__all__ = ["TrainConfig", "State", "make_train_step", "make_eval_step", "train_one_gnn", "BucketBatcher"]


@dataclasses.dataclass
class TrainConfig:
    hidden: int = 64
    layers: int = 2
    dropout: float = 0.1
    topk: int = 16
    context: bool = False  # DeepSets global context (net-new, models/one_gnn.py)
    use_cost_refinement: bool = False  # reference trains with cost=None (train_one_gnn.py:248)
    normalize_gap: bool = False  # scale-free primal gap across sizes
    normalize_costs: bool = False  # train in the same normalized space the pipeline serves in
    include_primal: bool = True  # greedy upper bound term (False: dual surrogate)
    lr: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    warmup_frac: float = 0.1
    min_lr: float = 0.0
    epochs: int = 10
    batch_size: int = 32
    min_epochs: int = 10
    patience: int = 6
    seed: int = 0


# Simple functional train state (params + opt state + step counter).
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class State:
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class BucketBatcher:
    """Groups instances by size, yields shuffled same-size batches.

    Keeps every batch shape-homogeneous so each (batch, n) pair jit-traces
    once — the TPU equivalent of the reference's padded collate.
    """

    def __init__(
        self,
        instances: Sequence[Dict[str, np.ndarray]],
        batch_size: int,
        seed: int = 0,
    ):
        self.by_size: Dict[int, List[Dict[str, np.ndarray]]] = {}
        for inst in instances:
            self.by_size.setdefault(int(inst["n"]), []).append(inst)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        jobs = []
        for n, insts in self.by_size.items():
            order = self.rng.permutation(len(insts))
            for s in range(0, len(insts), self.batch_size):
                idx = order[s : s + self.batch_size]
                jobs.append((n, idx))
        self.rng.shuffle(jobs)
        for n, idx in jobs:
            insts = self.by_size[n]
            cost = np.stack([insts[i]["cost"] for i in idx]).astype(np.float32)
            u = np.stack([insts[i]["u"] for i in idx]).astype(np.float32)
            v = np.stack([insts[i]["v"] for i in idx]).astype(np.float32)
            yield cost, u, v

    def num_batches(self) -> int:
        return sum(
            -(-len(v) // self.batch_size) for v in self.by_size.values()
        )


def _normalize_instance(cost, u_target):
    """Per-instance affine rescale to [0, 1], with duals mapped consistently.

    The serving pipeline normalizes costs before the model
    (pipeline.predict_duals_fn, normalize_costs=True) and maps u back through
    the affine transform; training in the same space removes a train/infer
    distribution shift (the reference trains on raw costs and serves raw —
    consistent but scale-fragile; here both sides are normalized).  Under
    C' = (C - mn)/a the optimal duals map as u' = (u - mn)/a, v' = v/a.
    Uses the same sentinel-robust scale as serving (ops/dual.robust_normalize)
    so sparse instances' forbidden-edge sentinels do not squash the signal.
    """
    from ..ops.dual import robust_normalize

    cost_n, mn, a = robust_normalize(cost)
    u_n = (u_target - mn[..., None]) / a[..., None]
    return cost_n, u_n


def make_train_step(
    model: OneGNN,
    tx: optax.GradientTransformation,
    use_cost: bool,
    normalize_gap: bool = False,
    include_primal: bool = True,
    normalize_costs: bool = False,
):
    """Jitted (state, cost, u_target, rng) -> (state, metrics)."""

    def loss_fn(params, cost, u_target, rng):
        if normalize_costs:
            cost, u_target = _normalize_instance(cost, u_target)
        feats = row_features(cost)
        preds = model.apply(
            params,
            feats,
            cost=cost if use_cost else None,
            deterministic=False,
            rngs={"dropout": rng},
        )
        return one_gnn_loss(
            cost, u_target, preds,
            normalize_gap=normalize_gap, include_primal=include_primal,
        )

    @jax.jit
    def step(state: State, cost, u_target, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, cost, u_target, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        out = {
            "loss": loss,
            "primal_gap_mean": jnp.mean(metrics["primal_gap"]),
            "feas_mean": jnp.mean(metrics["feas"]),
            "u_mse_mean": jnp.mean(metrics["u_mse"]),
        }
        return State(params, opt_state, state.step + 1), out

    return step


def make_eval_step(
    model: OneGNN,
    use_cost: bool,
    normalize_gap: bool = False,
    normalize_costs: bool = False,
):
    @jax.jit
    def step(params, cost, u_target):
        if normalize_costs:
            cost, u_target = _normalize_instance(cost, u_target)
        feats = row_features(cost)
        preds = model.apply(
            params, feats, cost=cost if use_cost else None, deterministic=True
        )
        _, metrics = one_gnn_loss(cost, u_target, preds, normalize_gap=normalize_gap)
        return {
            "primal_gap": metrics["primal_gap"],
            "feas": metrics["feas"],
            "u_mse": metrics["u_mse"],
        }

    return step


def train_one_gnn(
    train_instances: Sequence[Dict[str, np.ndarray]],
    val_instances: Optional[Sequence[Dict[str, np.ndarray]]] = None,
    config: Optional[TrainConfig] = None,
    log_fn: Callable[[str], None] = print,
) -> Tuple[dict, Dict[str, list]]:
    """Train OneGNN; returns (best_params, history).

    Early stopping on validation primal-gap median with patience, as in
    train_one_gnn.py:392-402.
    """
    cfg = config or TrainConfig()
    model = OneGNN(cfg.hidden, cfg.layers, cfg.dropout, cfg.topk, cfg.context)

    batcher = BucketBatcher(train_instances, cfg.batch_size, seed=cfg.seed)
    steps_per_epoch = max(1, batcher.num_batches())
    total_steps = steps_per_epoch * cfg.epochs
    schedule = warmup_cosine(
        cfg.lr, int(cfg.warmup_frac * total_steps), total_steps, cfg.min_lr
    )
    tx = make_optimizer(schedule, cfg.weight_decay, cfg.grad_clip)

    # Init with the smallest bucket.
    n0 = min(batcher.by_size)
    sample = batcher.by_size[n0][0]
    feat0 = row_features(jnp.asarray(sample["cost"][None], jnp.float32))
    key = jax.random.key(cfg.seed)
    params = model.init(
        key,
        feat0,
        cost=jnp.asarray(sample["cost"][None], jnp.float32)
        if cfg.use_cost_refinement
        else None,
    )
    state = State(params, tx.init(params), jnp.asarray(0))

    train_step = make_train_step(
        model, tx, cfg.use_cost_refinement, cfg.normalize_gap, cfg.include_primal,
        cfg.normalize_costs,
    )
    eval_step = make_eval_step(
        model, cfg.use_cost_refinement, normalize_costs=cfg.normalize_costs
    )

    history: Dict[str, list] = {"train_loss": [], "val_gap_median": []}
    best_params = jax.device_get(state.params)
    best_gap = float("inf")
    bad_epochs = 0

    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        losses = []
        for cost, u, v in batcher:
            key, sub = jax.random.split(key)
            state, m = train_step(state, jnp.asarray(cost), jnp.asarray(u), sub)
            losses.append(m["loss"])  # device array; float() would sync per step
        history["train_loss"].append(float(np.mean([float(l) for l in losses])) if losses else 0.0)

        if val_instances:
            gaps = []
            for cost, u, v in BucketBatcher(val_instances, cfg.batch_size, seed=0):
                m = eval_step(state.params, jnp.asarray(cost), jnp.asarray(u))
                gaps.extend(np.asarray(m["primal_gap"]).tolist())
            gap_med = float(np.median(gaps)) if gaps else float("inf")
            history["val_gap_median"].append(gap_med)
            log_fn(
                f"epoch {epoch}: loss={history['train_loss'][-1]:.4f} "
                f"val_gap_med={gap_med:.4f} ({time.perf_counter() - t0:.1f}s)"
            )
            if gap_med < best_gap - 1e-9:
                best_gap = gap_med
                best_params = jax.device_get(state.params)
                bad_epochs = 0
            elif epoch + 1 >= cfg.min_epochs:
                bad_epochs += 1
                if bad_epochs >= cfg.patience:
                    log_fn(f"early stop at epoch {epoch}")
                    break
        else:
            best_params = jax.device_get(state.params)
            log_fn(
                f"epoch {epoch}: loss={history['train_loss'][-1]:.4f} "
                f"({time.perf_counter() - t0:.1f}s)"
            )

    return best_params, history
