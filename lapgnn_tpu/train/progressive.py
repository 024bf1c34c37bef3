"""Progressive multi-size curriculum training (YAML-driven).

Re-designs ``/root/reference/gnn/train_progressive_clean.py:38-658``:
  * ``DatasetSpec`` — name/path/size/weight/curriculum_start_epoch (:38-45)
  * ``RoundRobinSampler`` — per-epoch active datasets by curriculum epoch,
    round-robin ``batches_per_size`` batches each, size-dependent batch sizes
    (<=1024 -> 32, <=2048 -> 16, <=4096 -> 8), reshuffle-on-exhaust (:91-179)
  * same loss as the OneGNN trainer + u/v MAE aux metrics (:280-333)
  * per-split validation capped at 50 instances, early stop on the average
    primal-gap median across splits (:571-621)
  * best/last checkpoints carrying optimizer state and the full config
    (:599-633); optional warm init from a previous checkpoint (:461-473).

Every batch is size-homogeneous, so each (batch_size, n) pair jit-traces once
and the whole curriculum runs from a handful of compiled programs.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import OneGNN
from .checkpoint import save_checkpoint
from .schedule import make_optimizer, warmup_cosine
from .trainer import State, make_eval_step, make_train_step

__all__ = ["DatasetSpec", "RoundRobinSampler", "train_progressive", "default_batch_size"]

# Size-dependent batch-size rules (train_progressive_clean.py:128-143).
BATCH_SIZE_RULES: List[Tuple[int, int]] = [(1024, 32), (2048, 16), (4096, 8)]

# Datasets at or above this size are device-cached under
# training.device_cache (below it streaming H2D is cheap); module-level so
# tests can exercise the cache path on tiny instances.
DEVICE_CACHE_MIN_N = 2048

# Sizes at or above this sync the loss to the host every step, bounding the
# number of in-flight H2D transfers (see the per-step comment in the train
# loop — round 3 was OOM-killed at 130 GB RSS without it).  Kept equal to
# DEVICE_CACHE_MIN_N so tuning one cannot silently drift the other.
SYNC_MIN_N = DEVICE_CACHE_MIN_N


def default_batch_size(n: int, rules: Optional[Sequence[Tuple[int, int]]] = None) -> int:
    for bound, bs in rules or BATCH_SIZE_RULES:
        if n <= bound:
            return bs
    return 4


@dataclasses.dataclass
class DatasetSpec:
    name: str
    size: int
    instances: Sequence[Dict[str, np.ndarray]]
    weight: float = 1.0
    curriculum_start_epoch: int = 0
    val_instances: Optional[Sequence[Dict[str, np.ndarray]]] = None


class RoundRobinSampler:
    """Yields (spec, batch arrays) round-robin over active datasets."""

    def __init__(
        self,
        specs: Sequence[DatasetSpec],
        batches_per_size: int = 6,
        batch_size_rules: Optional[Sequence[Tuple[int, int]]] = None,
        seed: int = 0,
    ):
        self.specs = list(specs)
        self.batches_per_size = batches_per_size
        self.rules = batch_size_rules
        self.rng = np.random.default_rng(seed)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _batches_for(self, spec: DatasetSpec) -> List[np.ndarray]:
        bs = default_batch_size(spec.size, self.rules)
        order = self.rng.permutation(len(spec.instances))
        if len(order) % bs and len(order) > bs:
            # Pad the tail batch by wrapping so every batch has the same
            # shape — one jit trace per (batch, n), no remainder recompiles.
            pad = bs - (len(order) % bs)
            order = np.concatenate([order, order[:pad]])
        return [order[i : i + bs] for i in range(0, len(order), bs)]

    @staticmethod
    def materialize(
        spec: DatasetSpec, idx: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Stack the selected instances into f32 (cost, u) batch arrays."""
        insts = [spec.instances[k] for k in idx]
        cost = np.stack([x["cost"] for x in insts]).astype(np.float32)
        u = np.stack([x["u"] for x in insts]).astype(np.float32)
        return cost, u

    def __iter__(self) -> Iterator[Tuple[DatasetSpec, np.ndarray, np.ndarray]]:
        for spec, idx in self.iter_indices():
            cost, u = self.materialize(spec, idx)
            yield spec, cost, u

    def iter_indices(self) -> Iterator[Tuple[DatasetSpec, np.ndarray]]:
        """Round-robin walk yielding (spec, instance-index array) — the
        array-free form that lets the trainer source batches from a
        device-resident dataset cache instead of re-uploading (see
        train_progressive's device_cache)."""
        active = [s for s in self.specs if s.curriculum_start_epoch <= self.epoch]
        if not active:
            return
        # Keyed by position, NOT spec.name: two YAML entries sharing a name
        # (e.g. the same file at two sizes) must not share a queue — one
        # dataset would silently never be trained on (or index out of
        # bounds against the other's instance list).
        queues = {i: self._batches_for(s) for i, s in enumerate(active)}
        # The epoch is paced by the LARGEST dataset; smaller ones reshuffle
        # on exhaust so the curriculum mixture holds through the epoch tail
        # (reference train_progressive_clean.py:91-179) instead of
        # collapsing to big-dataset-only batches.
        primary = max(queues, key=lambda i: len(queues[i]))
        done = False
        while not done:
            for i, spec in enumerate(active):
                # Honor the per-dataset oversampling weight (previously
                # parsed and printed but never read).
                turns = max(1, round(self.batches_per_size * spec.weight))
                for _ in range(turns):
                    if not queues[i]:
                        if i == primary:
                            # End the epoch after this cycle — the OTHER
                            # specs still take their turns below.
                            done = True
                            break
                        queues[i] = self._batches_for(spec)
                    yield spec, queues[i].pop()


def train_progressive(
    config: Dict,
    specs: Sequence[DatasetSpec],
    init_params=None,
    log_fn=print,
):
    """Run the curriculum. ``config`` follows progressive_clean_config.yaml
    shape: model / optimizer / sampling / training / checkpointing keys.

    Returns (best_params, history).
    """
    mcfg = config.get("model", {})
    ocfg = config.get("optimizer", {})
    scfg = config.get("sampling", {})
    tcfg = config.get("training", {})
    ccfg = config.get("checkpointing", {})

    if not specs:
        raise ValueError(
            "no datasets with instances — check the config's sizes/paths "
            "(every dataset was skipped at load time)"
        )
    model = OneGNN(
        hidden=int(mcfg.get("hidden", 64)),
        layers=int(mcfg.get("layers", 2)),
        dropout=float(mcfg.get("dropout", 0.1)),
        topk=int(mcfg.get("topk", 16)),
        context=bool(mcfg.get("context", False)),
    )
    use_cost = bool(mcfg.get("use_cost_refinement", False))
    normalize_gap = bool(config.get("loss", {}).get("normalize_gap", False))
    include_primal = bool(config.get("loss", {}).get("include_primal", True))
    normalize_costs = bool(config.get("loss", {}).get("normalize_costs", False))

    epochs = int(tcfg.get("epochs", 40))
    min_epochs = int(tcfg.get("min_epochs", 10))
    patience = int(tcfg.get("patience", 6))
    cache_mode = str(tcfg.get("device_cache", "off")).lower()
    if cache_mode not in ("off", "bf16", "f32"):
        raise ValueError(f"training.device_cache must be off|bf16|f32, got {cache_mode!r}")

    sampler = RoundRobinSampler(
        specs,
        batches_per_size=int(scfg.get("batches_per_size", 6)),
        seed=int(tcfg.get("seed", 0)),
    )

    # Rough steps/epoch estimate for the schedule.
    steps_per_epoch = sum(
        -(-len(s.instances) // default_batch_size(s.size)) for s in specs
    )
    total_steps = max(1, steps_per_epoch * epochs)
    schedule = warmup_cosine(
        float(ocfg.get("lr", 1e-3)),
        int(float(ocfg.get("warmup_frac", 0.1)) * total_steps),
        total_steps,
        float(ocfg.get("min_lr", 0.0)),
    )
    tx = make_optimizer(
        schedule,
        float(ocfg.get("weight_decay", 1e-4)),
        float(ocfg.get("grad_clip", 1.0)),
    )

    # Init params on the smallest dataset.
    from ..ops.features import row_features

    smallest = min(specs, key=lambda s: s.size)
    sample_cost = jnp.asarray(
        smallest.instances[0]["cost"][None], jnp.float32
    )
    key = jax.random.key(int(tcfg.get("seed", 0)))
    params = model.init(
        key,
        row_features(sample_cost),
        cost=sample_cost if use_cost else None,
    )
    if init_params is not None:
        from .checkpoint import merge_params

        params, n_loaded, n_total = merge_params(
            jax.device_get(params), init_params
        )
        log_fn(f"warm init: {n_loaded}/{n_total} leaves restored")
    state = State(params, tx.init(params), jnp.asarray(0))

    train_step = make_train_step(
        model, tx, use_cost, normalize_gap, include_primal, normalize_costs
    )
    eval_step = make_eval_step(model, use_cost, normalize_costs=normalize_costs)

    # Device-resident dataset cache (training.device_cache: bf16|f32).  The
    # curriculum re-uploads the SAME fixed instances every epoch — at
    # n>=4096 that is ~13 GB of H2D per epoch, and on the remote-attached
    # dev platform each transfer both crawls (~1 GB batches over the
    # tunnel dominated epoch time) and leaks host-side mirror memory (the
    # round-3 512..8192 run grew ~11 GB RSS per epoch even with per-step
    # syncs and died at 130 GB).  Caching uploads each instance ONCE and
    # sources every batch with an on-device gather; bf16 halves the
    # resident bytes (train-time costs are rounded to bf16 before the f32
    # upcast — the greedy-bound anchor sees the rounded instance, which is
    # a training-time perturbation only; supervision targets and all
    # validation stay f32).  Colocated deployments can use f32 or leave it
    # off.
    caches: Dict[int, Tuple] = {}
    val_caches: Dict[int, Tuple] = {}
    if cache_mode != "off":
        cdt = jnp.bfloat16 if cache_mode == "bf16" else jnp.float32
        for s in specs:
            if s.size < DEVICE_CACHE_MIN_N:
                continue  # small instances: streaming is cheap, skip
            rows = [
                jnp.asarray(np.asarray(x["cost"], np.float32)).astype(cdt)
                for x in s.instances
            ]
            Cc = jnp.stack(rows)
            del rows
            Uc = jnp.asarray(
                np.stack([np.asarray(x["u"], np.float32) for x in s.instances])
            )
            caches[id(s)] = (Cc, Uc)
            if s.val_instances:
                vals = list(s.val_instances)[:50]
                Vc = jnp.asarray(
                    np.stack([np.asarray(x["cost"], np.float32) for x in vals])
                )
                Vu = jnp.asarray(
                    np.stack([np.asarray(x["u"], np.float32) for x in vals])
                )
                val_caches[id(s)] = (Vc, Vu)
            log_fn(
                f"device-cached {s.name}: train {Cc.shape} as {cache_mode}"
                + (", val f32" if id(s) in val_caches else "")
            )

    out_dir = Path(ccfg.get("output_dir", "artifacts/progressive"))
    meta_base = {
        "architecture": "one_gnn",
        "hidden": model.hidden,
        "layers": model.layers,
        "dropout": model.dropout,
        "topk": model.topk,
        "context": model.context,
        "use_cost_refinement": use_cost,
        "row_feat_dim": 21,
        "config": config,
    }

    history = {"train_loss": [], "val_gap_median_avg": []}
    best = {"gap": float("inf"), "params": jax.device_get(state.params)}
    bad = 0
    # The val-gap average is only comparable between epochs that validate the
    # SAME split set; while the curriculum is still admitting datasets the
    # metric mixes different size populations (an epoch-0 small-n-only
    # average can look "better" than any full-curriculum epoch).  Track best
    # / early-stop only once every dataset is active.
    all_active_epoch = max((s.curriculum_start_epoch for s in specs), default=0)

    for epoch in range(epochs):
        t0 = time.perf_counter()
        sampler.set_epoch(epoch)
        losses = []
        for spec, idx in sampler.iter_indices():
            key, sub = jax.random.split(key)
            if id(spec) in caches:
                Cc, Uc = caches[id(spec)]
                ib = jnp.asarray(np.asarray(idx))
                cost_d = jnp.take(Cc, ib, axis=0).astype(jnp.float32)
                u_d = jnp.take(Uc, ib, axis=0)
            else:
                cost, u = sampler.materialize(spec, idx)
                cost_d, u_d = jnp.asarray(cost), jnp.asarray(u)
            state, m = train_step(state, cost_d, u_d, sub)
            # Small sizes: keep the device array — float() would force a
            # host sync every step and serialise dispatch with batch
            # assembly.  Large sizes: SYNC (D2H scalar readback).  Without
            # it nothing blocks until the epoch-end loss reduction, so the
            # whole epoch's H2D batches stay in flight — at n>=4096 that is
            # 0.5-1 GB per step, and the remote-platform client mirrors
            # each transfer on the host: the round-3 512..8192 curriculum
            # was OOM-killed at 130 GB RSS in epoch 3 exactly this way.
            # The sync costs nothing at these sizes (the step itself runs
            # seconds; dispatch overlap only matters for the small shapes).
            losses.append(
                float(m["loss"]) if spec.size >= SYNC_MIN_N else m["loss"]
            )
        history["train_loss"].append(
            float(np.mean([float(l) for l in losses])) if losses else 0.0
        )

        # Per-split validation (<= 50 instances each, :571-588).
        split_medians = []
        for spec in specs:
            vals = spec.val_instances or []
            if not vals or spec.curriculum_start_epoch > epoch:
                continue
            gaps = []
            bs = default_batch_size(spec.size)
            for s in range(0, min(len(vals), 50), bs):
                if id(spec) in val_caches:
                    Vc, Vu = val_caches[id(spec)]
                    cost = Vc[s : min(s + bs, 50)]
                    u = Vu[s : min(s + bs, 50)]
                else:
                    chunk = vals[s : min(s + bs, 50)]
                    cost = jnp.asarray(
                        np.stack([x["cost"] for x in chunk]), jnp.float32
                    )
                    u = jnp.asarray(np.stack([x["u"] for x in chunk]), jnp.float32)
                m = eval_step(state.params, cost, u)
                gaps.extend(np.asarray(m["primal_gap"]).tolist())
            if gaps:
                split_medians.append(float(np.median(gaps)))

        gap_avg = float(np.mean(split_medians)) if split_medians else float("inf")
        history["val_gap_median_avg"].append(gap_avg)
        if not split_medians:
            # No validation sets: keep the LATEST params as best and never
            # early-stop on the (meaningless) inf metric — previously a
            # val-less run returned the untrained epoch-0 init.
            best = {"gap": float("inf"), "params": jax.device_get(state.params)}
            bad = 0
        log_fn(
            f"epoch {epoch}: loss={history['train_loss'][-1]:.4f} "
            f"val_gap_med_avg={gap_avg:.4f} ({time.perf_counter() - t0:.1f}s)"
        )

        save_checkpoint(
            out_dir / "last",
            jax.device_get(state.params),
            {**meta_base, "epoch": epoch, "val_gap_median_avg": gap_avg},
            opt_state=jax.device_get(state.opt_state),
        )
        if epoch < all_active_epoch:
            continue
        if gap_avg < best["gap"] - 1e-9:
            best = {"gap": gap_avg, "params": jax.device_get(state.params)}
            bad = 0
            save_checkpoint(
                out_dir / "best",
                best["params"],
                {**meta_base, "epoch": epoch, "val_gap_median_avg": gap_avg},
            )
        elif epoch + 1 >= min_epochs:
            bad += 1
            if bad >= patience:
                log_fn(f"early stop at epoch {epoch}")
                break

    return best["params"], history
