"""Sharded execution paths: data-parallel training, row-sharded inference.

Design (new in this framework; the reference is single-process, SURVEY.md
§2.7).  The natural partitioning for the LAP workload shards the *rows* of
each cost matrix across the mesh's "model" axis:

  * 21-D row features: fully shard-local (each device owns whole rows) except
    the is-col-best channel, which needs the global column minimum - one
    min-all-reduce over the row shards.
  * OneGNN: per-row MLP + per-row top-k -> embarrassingly row-parallel.
  * min-trick v = min_i (C_ij - u_i): a column-wise min-reduce over the
    sharded row axis - one ``lax.pmin`` (rides ICI).

Two implementations are provided:
  * ``make_sharded_predict`` - GSPMD: jit with NamedSharding constraints;
    XLA inserts the collectives.
  * ``shmap_min_trick`` / ``shmap_row_features`` - explicit ``shard_map``
    versions with hand-placed ``pmin`` collectives (used by tests to pin the
    communication pattern, and as the substrate for later Pallas overlap).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.dual import min_trick_v
from ..ops.features import row_features
from ..train.loss import one_gnn_loss

__all__ = [
    "make_sharded_predict",
    "shmap_min_trick",
    "shmap_col_min",
    "make_dp_train_step",
]


def make_sharded_predict(
    model, mesh: Mesh, use_cost_refinement: bool = True, seed_mode: str = "auto"
):
    """GSPMD pipeline: (params, cost) -> (u, v) with batch over 'data' and
    rows over 'model'.

    ``seed_mode='auto'`` matches the single-device serving default
    (pipeline.predict_duals_fn): the rank-1 analytic candidate
    (ops/rank1.py) is computed alongside the GNN seed, the per-instance
    objective winner is Sinkhorn-refined (ops/sinkhorn.py), and the final
    selection runs under the unique-argmin collision veto.  The rank-1
    matvecs are row-sharded matmuls (XLA inserts the psum over 'model');
    the argsort over the factor vectors gathers one (n,)-vector per
    instance — O(n) collective traffic, negligible next to the
    O(n²/devices) feature pass.  The Sinkhorn logsumexp sweeps contract
    one matrix axis each, lowering to shard-local reductions + an O(n)
    combine per pass, same as the min-trick.
    """
    if seed_mode not in ("gnn", "rank1", "auto"):
        raise ValueError("seed_mode must be 'gnn', 'rank1', or 'auto'")
    if getattr(model, "topk_impl", None) == "top_k":
        # see parallel/solver.py: lax.top_k replicates row-sharded operands.
        model = model.clone(topk_impl="iter")
    cost_sharding = NamedSharding(mesh, P("data", "model", None))
    vec_sharding = NamedSharding(mesh, P("data", "model"))

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, P()), cost_sharding),
        out_shardings=(vec_sharding, NamedSharding(mesh, P("data", None))),
    )
    def predict(params, cost):
        from ..ops.rank1 import rank1_duals, select_best_seed

        if seed_mode == "rank1":
            u, _ = rank1_duals(cost)
            return u, min_trick_v(cost, u)
        feats = row_features(cost)
        preds = model.apply(params, feats, cost=cost if use_cost_refinement else None)
        u = preds["u"].astype(cost.dtype)
        if seed_mode == "auto":
            from ..ops.sinkhorn import auto_select_seed

            return auto_select_seed(cost, u, min_trick=min_trick_v)
        v = min_trick_v(cost, u)
        return u, v

    return predict


def shmap_col_min(mesh: Mesh, axis: str = "model"):
    """Explicit-collective column min over row-sharded C: (n, m) -> (m,)."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=P(),
        check_vma=False,
    )
    def col_min(C_blk):
        return lax.pmin(jnp.min(C_blk, axis=0), axis)

    return col_min


def shmap_min_trick(mesh: Mesh, axis: str = "model"):
    """Explicit-collective min-trick over row-sharded (C, u): v replicated."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def mt(C_blk, u_blk):
        local = jnp.min(C_blk - u_blk[:, None], axis=0)
        return lax.pmin(local, axis)

    return mt


def make_dp_train_step(model, tx, mesh: Mesh, use_cost: bool, shard_rows: bool = True):
    """Data-parallel (+ optional row-sharded) jitted train step over a mesh.

    Batch is split over 'data'; with ``shard_rows`` each instance's rows are
    additionally split over 'model' (sequence-parallel analog, SURVEY.md §5).
    Parameters and optimizer state are replicated; XLA derives the gradient
    all-reduce from the sharding constraints.
    """
    from ..train.trainer import State

    if shard_rows and use_cost and getattr(model, "topk_impl", None) == "top_k":
        # row-sharded refinement: same lax.top_k replication as in predict.
        model = model.clone(topk_impl="iter")
    spec_cost = P("data", "model", None) if shard_rows else P("data", None, None)
    spec_vec = P("data", "model") if shard_rows else P("data", None)

    @functools.partial(
        jax.jit,
        in_shardings=(
            None,  # state: replicated (left to XLA)
            NamedSharding(mesh, spec_cost),
            NamedSharding(mesh, spec_vec),
            None,
        ),
    )
    def step(state: State, cost, u_target, rng):
        def loss_fn(params):
            feats = row_features(cost)
            preds = model.apply(
                params,
                feats,
                cost=cost if use_cost else None,
                deterministic=False,
                rngs={"dropout": rng},
            )
            loss, metrics = one_gnn_loss(cost, u_target, preds)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        import optax

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        out = {
            "loss": loss,
            "primal_gap_mean": jnp.mean(metrics["primal_gap"]),
            "feas_mean": jnp.mean(metrics["feas"]),
        }
        return State(params, opt_state, state.step + 1), out

    return step
