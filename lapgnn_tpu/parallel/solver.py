"""Sharded end-to-end seeded solve: the full pipeline partitioned over a mesh.

North-star distributed path (net-new vs the reference, which is single-process
— SURVEY.md §2.7): one instance's (n, n) cost matrix is sharded by ROWS over
the mesh axis, and every phase of the warm-started JV solve
(`solver/seeded.py`, mirroring lapjv_seeded.cpp:19-173) runs partitioned:

  phase                       distributed shape
  --------------------------  -------------------------------------------
  feasibility projection      row-local min + column-min combine (pmin)
  row tightening              row-local reduction
  greedy tight matching       row-local proposals + O(n) column-acceptance
                              combine per round
  density / free-rows gate    local count + psum
  jacobi ARR                  row-local two-min + O(n) column combine
  sweep augmentation          min-plus matvec: row-local (n/S, n) relax +
                              column-min pmin combine per sweep

The enabling design choice is in `jv._sweep_shortest_paths`: relaxation
through rows (d_k = min_i d[x_i] + red[i, k]) reads the row-sharded reduced
costs IN PLACE — the column-graph formulation would need the row permutation
red[y, :], an all-to-all per sweep.  All matching-state vectors (x, y, v, d)
are O(n) and replicated; every collective moves O(n) data while every shard
does O(n^2 / S) local work.

Implementation is GSPMD: `jax.jit` with NamedSharding constraints on the
inputs; XLA partitions the program and inserts the collectives (the
mesh/annotate/compile recipe).  `assert_no_matrix_allgather` inspects the
compiled HLO to pin down that no (n, n)-sized operand is ever gathered —
the guard that GSPMD kept the program truly partitioned.
"""

from __future__ import annotations

import functools
import re

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dual import min_trick_v
from ..ops.features import row_features
from ..solver.seeded import SeededResult, lapjv_seeded_single

__all__ = [
    "make_sharded_seeded_solve",
    "make_sharded_pipeline",
    "assert_no_matrix_allgather",
]


def make_sharded_seeded_solve(
    mesh: Mesh,
    axis: str = "model",
    eps: float = 1e-12,
    gate: str = "both",
):
    """Build jitted (C, u_seed, v_seed) -> SeededResult with C row-sharded.

    C: (n, n) sharded P(axis, None); u_seed row-sharded; v_seed replicated.
    Outputs (assignment vectors, cost) are replicated — they are O(n).
    """
    cost_s = NamedSharding(mesh, P(axis, None))
    row_s = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(cost_s, row_s, rep),
        out_shardings=SeededResult(rep, rep, rep, rep, rep),
    )
    def solve(C, u_seed, v_seed):
        return lapjv_seeded_single(C, u_seed, v_seed, eps=eps, gate=gate)

    return solve


def make_sharded_pipeline(
    model,
    mesh: Mesh,
    axis: str = "model",
    eps: float = 1e-12,
    gate: str = "both",
    use_cost_refinement: bool = True,
    normalize_costs: bool = True,
    seed_mode: str = "auto",
):
    """Full pipeline partitioned over the mesh for ONE large instance:

        C (rows sharded) -> 21-D features (row-local + col-min combine)
          -> OneGNN (row-parallel MLP + per-row top-k)
          -> min-trick v (column-min pmin)
          -> sharded seeded JV solve

    Returns jitted (params, C) -> SeededResult.  Model params replicated.
    """
    if seed_mode not in ("gnn", "rank1", "auto"):
        raise ValueError("seed_mode must be 'gnn', 'rank1', or 'auto'")
    if getattr(model, "topk_impl", None) == "top_k":
        # lax.top_k all-gathers the row-sharded matrix under GSPMD; the
        # iterative variant is value-identical and stays row-local.
        model = model.clone(topk_impl="iter")
    cost_s = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(rep, cost_s),
        out_shardings=SeededResult(rep, rep, rep, rep, rep),
    )
    def run(params, C):
        # Rank-1 analytic candidate (ops/rank1.py): the matvecs are
        # row-local + an O(n) psum, the factor sorts/cumsum are O(n)
        # replicated vectors — the no-matrix-allgather contract holds.
        from ..ops.rank1 import rank1_duals, select_best_seed

        if seed_mode == "rank1":
            u, _ = rank1_duals(C)
            return lapjv_seeded_single(
                C, u, min_trick_v(C, u), eps=eps, gate=gate
            )
        if normalize_costs:
            from ..ops.dual import robust_normalize

            C_in, mn, a = robust_normalize(C)
        else:
            C_in = C
        feats = row_features(C_in[None])
        preds = model.apply(
            params, feats, cost=C_in[None] if use_cost_refinement else None
        )
        u = preds["u"][0].astype(C.dtype)
        if normalize_costs:
            u = u * a + mn
        if seed_mode == "auto":
            u_r1, _ = rank1_duals(C)
            u, v = select_best_seed(C, (u, u_r1), min_trick=min_trick_v)
        else:
            v = min_trick_v(C, u)
        return lapjv_seeded_single(C, u, v, eps=eps, gate=gate)

    return run


# Match only collective DEFINITIONS, anchored per line: the old pattern's
# [^=]* ran across newlines, so a bare operand *reference* to an all-gather
# at end-of-line made it capture the NEXT instruction's shape (flaky false
# positives), and tuple-typed async starts yielded the input shard instead
# of the gathered output.  The guard also covers all-reduce / all-to-all /
# collective-permute: GSPMD resharding does not always lower to all-gather,
# and an O(n^2) all-reduce breaks the contract just as badly.
_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?(?:all-gather|all-reduce|all-to-all|collective-permute)"
    r"[^\n=]*=\s*(\(?[^)\n]*\)?)\s*(?:all-gather|all-reduce|all-to-all|"
    r"collective-permute)",
    re.M,
)
_SHAPE_RE = re.compile(r"\[([0-9,]+)\]")


def assert_no_matrix_allgather(compiled, n: int, shards: int) -> None:
    """Fail if the compiled HLO all-gathers any O(n^2)-sized operand.

    The sharded solve's contract is that collectives only ever move O(n)
    vectors; a full-matrix gather means GSPMD silently replicated the work.
    Allows gathers up to 8n elements (vector combines padded to (n+1) etc.),
    rejects anything within 4x of a full shard block (n^2 / shards).
    """
    text = compiled.as_text()
    limit = max(8 * n, (n * n // shards) // 4)
    for m in _COLLECTIVE_RE.finditer(text):
        # Tuple-shaped async ops list several shapes; the largest element is
        # the one the collective moves.
        for sm in _SHAPE_RE.finditer(m.group(1)):
            shape = [int(s) for s in sm.group(1).split(",") if s]
            size = 1
            for s in shape:
                size *= s
            if size > limit:
                raise AssertionError(
                    f"compiled sharded solve moves a {shape} operand through "
                    f"a collective ({size} elements > limit {limit}); the "
                    "matrix is being replicated instead of partitioned"
                )
