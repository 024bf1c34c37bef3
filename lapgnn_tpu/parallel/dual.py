"""2-D (row x col) edge partitioning for the DualGNN — the O(n^2 * hidden)
component that genuinely cannot fit one device at large n.

Design (net-new vs the reference, which caps DualGNN at n <= 2048 on one
GPU — gnn/dual_gnn.py:146-204, train guard train_progressive_clean.py:192).
The dense bipartite graph's edge tensors are sharded over BOTH mesh axes:

  * edge features (B, n, n, 10) and every layer's (B, n, n, hidden) edge
    activations live as (row, col) tiles — per-device memory is
    O(n^2 * hidden / devices), the whole point of the partitioning.
  * row embeddings shard over 'row', column embeddings over 'col'; all
    per-node Dense/LayerNorm work is local.
  * the two attention directions (reference gnn/dual_gnn.py:89-141) reduce
    over one matrix axis each: the softmax max/sum and the message einsum
    contract over the axis that is sharded, so GSPMD lowers them to a local
    partial reduction + an O(n * heads / hidden) combine over ONE mesh axis
    subgroup — vector-sized collectives riding ICI, never edge tensors.

Memory hierarchy note: the cost matrix itself (4 B/edge) is 10-128x smaller
than the edge-feature stack (40 B/edge) and the per-layer edge activations
(4*hidden B/edge).  The rank channels of `graph_features` need whole rows /
whole columns for their sorts, so XLA may reshard C (one axis at a time) to
compute them — moving O(n^2 / axis_groups) of *cost-matrix-sized* data is
accepted; what the compiled-HLO contract (`assert_no_edge_tensor_gather`)
forbids is any collective moving an operand at edge-tensor scale (>= 1.5
matrix-equivalents), which would mean GSPMD replicated the partitioned work.
"""

from __future__ import annotations

import functools
import re

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dual import min_trick_v
from ..ops.features import graph_features

__all__ = [
    "make_sharded_dual_predict",
    "make_sharded_dual_train_step",
    "make_sharded_dual_eval_step",
    "assert_no_edge_tensor_gather",
    "dual_mesh",
]


def dual_mesh(devices=None, row: int = 0, col: int = 0) -> Mesh:
    """Build a ('row', 'col') mesh from the available devices.

    Defaults to the most-square factorisation (row >= col), which balances
    the two attention directions' subgroup combine sizes.
    """
    import numpy as np

    if devices is None:
        devices = jax.devices()
    d = len(devices)
    if row and col:
        if row * col != d:
            raise ValueError(f"row*col = {row * col} != {d} devices")
    elif row or col:
        # One axis pinned: derive the other instead of silently ignoring the
        # request and handing back the auto square factorisation.
        fixed = row or col
        if d % fixed != 0:
            raise ValueError(
                f"{'row' if row else 'col'}={fixed} does not divide {d} devices"
            )
        if row:
            col = d // row
        else:
            row = d // col
    else:
        row = int(np.sqrt(d))
        while d % row != 0:
            row -= 1
        row, col = max(row, d // row), min(row, d // row)
    mesh_devices = np.asarray(devices).reshape(row, col)
    return Mesh(mesh_devices, axis_names=("row", "col"))


def make_sharded_dual_predict(model, mesh: Mesh, project: bool = True):
    """GSPMD DualGNN pipeline: (params, cost) -> (u, v) over a (row, col) mesh.

    cost (B, n, n) arrives (or is resharded) as (row, col) tiles; features,
    the bidirectional attention stack, and the min-trick run partitioned;
    u/v come back replicated (O(n) outputs).  ``project=True`` returns
    v = min_i(C_ij - u_i) (dual-feasible by construction — the reference
    eval ignores v_hint for v as well, gnn/eval.py:119); ``project=False``
    returns the raw v_hint for dual-quality evaluation.
    """
    if "row" not in mesh.axis_names or "col" not in mesh.axis_names:
        raise ValueError("mesh must have ('row', 'col') axes — see dual_mesh()")
    cost_sharding = NamedSharding(mesh, P(None, "row", "col"))
    rep = NamedSharding(mesh, P(None, None))

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, P()), cost_sharding),
        out_shardings=(rep, rep),
    )
    def predict(params, cost):
        cost = cost.astype(jnp.float32)
        gf = graph_features(
            cost,
            constrain_rows=lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, "row", None))
            ),
            constrain_cols=lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, None, "col"))
            ),
        )
        # Pin the layouts the attention stack must run in; GSPMD propagates
        # them backwards through the feature computation.
        edge = jax.lax.with_sharding_constraint(
            gf.edge_feat, NamedSharding(mesh, P(None, "row", "col", None))
        )
        rowf = jax.lax.with_sharding_constraint(
            gf.row_feat, NamedSharding(mesh, P(None, "row", None))
        )
        colf = jax.lax.with_sharding_constraint(
            gf.col_feat, NamedSharding(mesh, P(None, "col", None))
        )
        preds = model.apply(params, edge, rowf, colf)
        u = preds["u"].astype(cost.dtype)
        if project:
            v = min_trick_v(cost, u)  # contracts the row axis: pmin combine
        else:
            v = preds["v_hint"].astype(cost.dtype)
        return u, v

    return predict


def make_sharded_dual_train_step(
    model,
    tx,
    mesh: Mesh,
    clip_sentinels: bool = True,
    normalize_gap: bool = True,
    supervise_duals: bool = True,
):
    """Jitted DualGNN loss+grad step over the 2-D (row x col) edge partition.

    This is the component that breaks the reference's single-device memory
    cap on DualGNN training (n <= 2048, guard at
    /root/reference/gnn/train_progressive_clean.py:192-194 and the O(n^2 *
    hidden) model at gnn/dual_gnn.py:146-204): every (B, n, n, *) edge
    tensor — features, per-layer activations, AND their backward-pass
    gradients — stays (row, col)-tiled across the mesh, so per-device peak
    memory is O(n^2 * hidden / devices).  Params and optimizer state are
    replicated (they are O(hidden^2), vanishing next to the edge tensors);
    the gradient all-reduce GSPMD inserts is over param-sized operands only.
    The no-edge-tensor-gather HLO contract is checked by the caller via
    ``assert_no_edge_tensor_gather`` on the COMPILED step, covering the
    backward pass as well.  Caveat: the check's edge-scale threshold is
    3n^2/2 elements, and the param-gradient all-reduce is a legitimate
    collective over the largest param (hidden x hidden, or the 128 x 128
    edge-MLP core) — so the contract is only meaningful when
    3n^2/2 > max param size, i.e. n >= ~105 for the default widths.  At the
    sizes the partition exists for (n >= 2048) this is never a constraint.

    The loss is ``train.loss.dual_gnn_loss`` with ``include_primal=False``:
    the greedy primal bound is an n-step sequential scan whose per-row
    dynamic slice of the tiled reduced matrix would force a cross-shard
    gather per step; the dual-maximisation surrogate keeps every term a
    sharded reduction.  (The OneGNN large-n fine-tune path made the same
    trade — train/loss.py.)

    Returns ``step(state, cost, u_target, rng) -> (state, metrics)`` where
    ``cost`` is (B, n, n) and arrives (or is resharded) as (row, col) tiles.
    """
    from ..train.loss import dual_gnn_loss

    if "row" not in mesh.axis_names or "col" not in mesh.axis_names:
        raise ValueError("mesh must have ('row', 'col') axes — see dual_mesh()")
    import optax

    from ..train.trainer import State

    cost_sharding = NamedSharding(mesh, P(None, "row", "col"))
    rep = NamedSharding(mesh, P())

    def wsc(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def loss_fn(params, cost, u_target, rng):
        gf = graph_features(
            cost,
            constrain_rows=lambda x: wsc(x, P(None, "row", None)),
            constrain_cols=lambda x: wsc(x, P(None, None, "col")),
        )
        edge = wsc(gf.edge_feat, P(None, "row", "col", None))
        rowf = wsc(gf.row_feat, P(None, "row", None))
        colf = wsc(gf.col_feat, P(None, "col", None))
        preds = model.apply(
            params, edge, rowf, colf,
            deterministic=False, rngs={"dropout": rng},
        )
        return dual_gnn_loss(
            cost, preds,
            normalize_gap=normalize_gap,
            clip_sentinels=clip_sentinels,
            u_target=u_target if supervise_duals else None,
            include_primal=False,
        )

    @functools.partial(
        jax.jit,
        in_shardings=(rep, cost_sharding, rep, rep),
        out_shardings=(rep, rep),
    )
    def step(state, cost, u_target, rng):
        cost = cost.astype(jnp.float32)
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


def make_sharded_dual_eval_step(
    model,
    mesh: Mesh,
    clip_sentinels: bool = True,
    normalize_gap: bool = True,
):
    """Sharded twin of ``train.dual_trainer.make_dual_eval_step``.

    Same (row, col) edge tiling as the train step; metrics use the
    dual-maximisation surrogate gap (``include_primal=False``) because the
    greedy bound's n-step sequential scan would gather across shards — the
    returned 'primal_gap' is therefore the SURROGATE gap (anchor − dual
    lower bound), comparable across epochs but not across loss variants.
    """
    from ..train.loss import dual_gnn_loss

    if "row" not in mesh.axis_names or "col" not in mesh.axis_names:
        raise ValueError("mesh must have ('row', 'col') axes — see dual_mesh()")
    cost_sharding = NamedSharding(mesh, P(None, "row", "col"))
    rep = NamedSharding(mesh, P())

    def wsc(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    @functools.partial(
        jax.jit, in_shardings=(rep, cost_sharding), out_shardings=rep,
    )
    def step(params, cost):
        cost = cost.astype(jnp.float32)
        gf = graph_features(
            cost,
            constrain_rows=lambda x: wsc(x, P(None, "row", None)),
            constrain_cols=lambda x: wsc(x, P(None, None, "col")),
        )
        edge = wsc(gf.edge_feat, P(None, "row", "col", None))
        rowf = wsc(gf.row_feat, P(None, "row", None))
        colf = wsc(gf.col_feat, P(None, "col", None))
        preds = model.apply(params, edge, rowf, colf)
        _, metrics = dual_gnn_loss(
            cost, preds, normalize_gap=normalize_gap,
            clip_sentinels=clip_sentinels, include_primal=False,
        )
        return {"primal_gap": metrics["primal_gap"], "feas": metrics["feas"]}

    return step


# Collective-definition matcher shared with the solver guard (see
# parallel/solver.py for why it is line-anchored and definition-only).
# reduce-scatter is included: its OUTPUT is 1/shards of the input, so an
# edge-scale replicated operand entering a reduce-scatter would slip past a
# result-shape-only check — the operand shapes are checked too (below).
_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?(?:all-gather|all-reduce|all-to-all|collective-permute"
    r"|reduce-scatter)"
    r"[^\n=]*=\s*(\(?[^)\n]*\)?)\s*(?:all-gather|all-reduce|all-to-all|"
    r"collective-permute|reduce-scatter)",
    re.M,
)
_SHAPE_RE = re.compile(r"\[([0-9,]+)\]")


def assert_no_edge_tensor_gather(compiled, n: int) -> None:
    """Fail if the compiled HLO moves an edge-tensor-scale operand through a
    collective.

    Contract: cost-matrix-sized reshards (<= ~1.5 n^2 elements — the rank
    sorts legitimately regroup C one axis at a time) are allowed; anything
    larger means an (n, n, feat) or (n, n, hidden) edge tensor is being
    gathered/replicated instead of staying (row, col)-tiled, defeating the
    O(n^2 * hidden / devices) memory contract.
    """
    text = compiled.as_text()
    limit = (3 * n * n) // 2
    for m in _COLLECTIVE_RE.finditer(text):
        # Check every shape token on the definition line — the RESULT shape
        # and the OPERAND shapes: a reduce-scatter shrinks its output by the
        # shard count, so a result-only check would miss an edge-scale
        # replicated operand feeding it.
        line_end = text.find("\n", m.start())
        line = text[m.start() : line_end if line_end >= 0 else len(text)]
        for sm in _SHAPE_RE.finditer(line):
            shape = [int(s) for s in sm.group(1).split(",") if s]
            size = 1
            for s in shape:
                size *= s
            if size > limit:
                raise AssertionError(
                    f"compiled sharded DualGNN moves a {shape} operand "
                    f"({size} elements > limit {limit}) through a collective;"
                    " an edge tensor is being replicated instead of tiled"
                )
