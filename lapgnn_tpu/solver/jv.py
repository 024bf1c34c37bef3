"""Batched Jonker–Volgenant LAP solver in pure JAX.

A from-scratch, TPU-first re-design of the reference's C++ dense JV solver
(``/root/reference/LAP/_lapjv_cpp/lapjv.cpp:8-346``).  The reference is a
sequential pointer-chasing C program; this implementation re-expresses each
phase as masked vector reductions driven by ``lax.while_loop`` so the whole
solve stays on device, is jittable, vmappable over a batch, and works at any
precision the caller picks (float32 on TPU, float64 on CPU for bit-accurate
verification).

Phase mapping (reference -> here):
  * column reduction + reduction transfer (_ccrrt_dense, lapjv.cpp:8-72)
      -> ``column_reduction``: one column-min + scatter-max unique assignment
         + vectorised reduction transfer.
  * augmenting row reduction (_carr_dense, lapjv.cpp:76-149)
      -> intentionally omitted; it is a sequential accelerator whose work is
         subsumed by the shortest-path phase.  (Revisit for perf if needed.)
  * shortest augmenting path (find_path_dense/_scan_dense, lapjv.cpp:153-282)
      -> ``_find_augmenting_path``: textbook Dijkstra over columns, one
         vectorised relax per popped column, early exit on a free column.
  * augmentation (_ca_dense, lapjv.cpp:286-319)
      -> ``_flip_along_path``: bounded pointer chase via while_loop.

The solver maintains the JV invariants: v are column duals, matched rows are
tight w.r.t. the implicit u_i = C[i, x_i] - v[x_i], and reduced costs stay
non-negative, so on termination the assignment is optimal.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "column_reduction",
    "augment_all",
    "augment_all_multisource",
    "augment_all_sweep",
    "polish_matching",
    "lapjv_single",
    "lapjv_batch",
    "matching_cost",
]

INT = jnp.int32


class Matching(NamedTuple):
    """Partial/complete matching state.

    col_of_row: (n,) int32, column matched to each row, -1 if free (x in JV).
    row_of_col: (n,) int32, row matched to each column, -1 if free (y in JV).
    v:          (n,) column dual potentials.
    """

    col_of_row: jnp.ndarray
    row_of_col: jnp.ndarray
    v: jnp.ndarray


def matching_cost(C: jnp.ndarray, col_of_row: jnp.ndarray) -> jnp.ndarray:
    """Total assignment cost sum_i C[i, x_i] (batched over leading dims)."""
    picked = jnp.take_along_axis(C, col_of_row[..., :, None], axis=-1)[..., 0]
    return jnp.sum(picked, axis=-1)


def column_reduction(C: jnp.ndarray) -> Matching:
    """Column reduction + reduction transfer (lapjv.cpp:8-72, vectorised).

    1. v_j = min_i C[i, j]; y_j = first row attaining it (argmin).
    2. Rows claimed by multiple columns keep only the largest such column
       (the reference scans j = n-1..0 and keeps the first seen, i.e. the
       largest j — reproduced here with a scatter-max).
    3. Rows claimed by exactly one column get a reduction transfer:
       v[x_i] -= min_{j != x_i} (C[i, j] - v[j]).
    """
    n = C.shape[-1]
    iota = lax.iota(INT, n)

    v = jnp.min(C, axis=0)
    y0 = jnp.argmin(C, axis=0).astype(INT)

    # Unique assignment: x[i] = max{ j : y[j] == i } via scatter-max.
    x = jnp.full((n,), -1, INT).at[y0].max(iota)
    # Column keeps its row only if it won the scatter.
    y = jnp.where(x[y0] == iota, y0, -1)

    # Count of columns that pointed at each row (pre-dedup).
    claims = jnp.zeros((n,), INT).at[y0].add(1)
    unique_rows = (claims == 1) & (x >= 0)

    # Reduction transfer for uniquely assigned rows.
    red = C - v[None, :]
    red_excl = jnp.where(iota[None, :] == x[:, None], jnp.inf, red)
    slack = jnp.min(red_excl, axis=1)  # min_{j != x_i} (C[i,j] - v[j])
    safe_x = jnp.where(x >= 0, x, 0)
    # n=1 (or an all-forbidden row): the excluded min is over an empty set,
    # slack = inf, and an unguarded transfer would send v to -inf — garbage
    # in the dual certificate.
    delta = jnp.where(unique_rows & jnp.isfinite(slack), slack, 0.0).astype(C.dtype)
    # x is injective on assigned rows, so the scatter has no collisions.
    v = v.at[safe_x].add(-delta)

    return Matching(col_of_row=x, row_of_col=y, v=v)


class _PathState(NamedTuple):
    d: jnp.ndarray        # (n,) tentative distances over columns
    pred: jnp.ndarray     # (n,) predecessor row per column
    scanned: jnp.ndarray  # (n,) bool: column popped & relaxed (the READY set)
    final_j: jnp.ndarray  # scalar int32: free column reached, -1 while searching
    mind: jnp.ndarray     # scalar: distance of the last popped column
    steps: jnp.ndarray    # scalar int32 iteration counter (safety bound)


def _dijkstra_to_free_col(
    C: jnp.ndarray,
    row_of_col: jnp.ndarray,
    v: jnp.ndarray,
    d0: jnp.ndarray,
    pred0: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared Dijkstra core: from initial column distances ``d0`` (any
    source layer — one free row or a virtual multi-source), pop the
    unscanned column with minimal d; if free we are done, otherwise relax
    through its matched row.  Ends with the classical READY-set dual update
    (lapjv.cpp:221-282).  Returns (final_j, pred, v_updated).

    One body serves both the single-source and multi-source searches — they
    previously duplicated this loop verbatim, so a relaxation fix had to be
    applied twice.
    """
    n = C.shape[-1]
    inf = jnp.asarray(jnp.inf, C.dtype)

    init = _PathState(
        d=d0,
        pred=pred0,
        scanned=jnp.zeros((n,), jnp.bool_),
        final_j=jnp.asarray(-1, INT),
        mind=jnp.asarray(0, C.dtype),
        steps=jnp.asarray(0, INT),
    )

    def cond(s: _PathState):
        return (s.final_j < 0) & (s.steps <= n)

    def body(s: _PathState) -> _PathState:
        d_open = jnp.where(s.scanned, inf, s.d)
        j = jnp.argmin(d_open).astype(INT)
        mind = d_open[j]
        i = row_of_col[j]

        def on_free(s):
            return s._replace(final_j=j, mind=mind, steps=s.steps + 1)

        def on_matched(s):
            scanned = s.scanned.at[j].set(True)
            # Slack of the matched row at its own column under current d.
            h = C[i, j] - v[j] - mind
            cand = C[i] - v - h
            improve = (~scanned) & (cand < s.d)
            d = jnp.where(improve, cand, s.d)
            pred = jnp.where(improve, i, s.pred)
            return _PathState(d, pred, scanned, s.final_j, mind, s.steps + 1)

        return lax.cond(i < 0, on_free, on_matched, s)

    s = lax.while_loop(cond, body, init)

    # Dual update on the READY set (lapjv.cpp:270-276): v[j] += d[j] - mind.
    v_new = jnp.where(s.scanned, v + s.d - s.mind, v)
    return s.final_j, s.pred, v_new


def _find_augmenting_path(
    C: jnp.ndarray, free_row: jnp.ndarray, row_of_col: jnp.ndarray, v: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dijkstra from ``free_row`` to the nearest free column
    (find_path_dense, lapjv.cpp:221-282)."""
    n = C.shape[-1]
    return _dijkstra_to_free_col(
        C, row_of_col, v,
        d0=C[free_row] - v,
        pred0=jnp.full((n,), free_row, INT),
    )


def _flip_along_path(
    free_row: jnp.ndarray,
    final_j: jnp.ndarray,
    pred: jnp.ndarray,
    col_of_row: jnp.ndarray,
    row_of_col: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flip matched/unmatched edges along the alternating path (lapjv.cpp:286-319)."""
    n = pred.shape[0]

    def cond(state):
        j, x, y, done, k = state
        return (~done) & (k <= n)

    def body(state):
        j, x, y, done, k = state
        i = pred[j]
        y = y.at[j].set(i)
        next_j = x[i]
        x = x.at[i].set(j)
        return next_j, x, y, i == free_row, k + 1

    _, x, y, _, _ = lax.while_loop(
        cond,
        body,
        (final_j, col_of_row, row_of_col, jnp.asarray(False), jnp.asarray(0, INT)),
    )
    return x, y


def _bounded_augment_loop(m: Matching, n: int, round_fn) -> Matching:
    """Run ``round_fn`` until the matching is complete, at most n+1 rounds.

    Every round of each augmentation strategy matches at least one row when
    the costs are finite, so n rounds always suffice.  The bound exists for
    POISONED inputs: a NaN entry (or an all-inf forbidden row: inf - inf)
    makes every distance comparison False — no flip happens, and an
    unbounded ``while any(col_of_row < 0)`` would spin the device forever
    inside one jitted call.  With the bound, garbage input returns a partial
    matching that downstream verification (matching_cost gives NaN,
    certify_assignment fails) reports instead of hanging.
    """

    def cond(state):
        m, it = state
        return jnp.any(m.col_of_row < 0) & (it <= n)

    def body(state):
        m, it = state
        return round_fn(m), it + 1

    out, _ = lax.while_loop(cond, body, (m, jnp.asarray(0, INT)))
    return out


def _one_path_round(C: jnp.ndarray, m: Matching) -> Matching:
    free_row = jnp.argmin(m.col_of_row).astype(INT)  # first row with x = -1
    final_j, pred, v = _find_augmenting_path(C, free_row, m.row_of_col, m.v)
    x, y = _flip_along_path(free_row, final_j, pred, m.col_of_row, m.row_of_col)
    return Matching(x, y, v)


def _one_multisource_round(C: jnp.ndarray, m: Matching) -> Matching:
    free = m.col_of_row < 0
    final_j, pred, v = _multisource_path(C, free, m.row_of_col, m.v)
    x, y = _flip_to_source(final_j, pred, m.col_of_row, m.row_of_col)
    return Matching(x, y, v)


def augment_all(C: jnp.ndarray, m: Matching) -> Matching:
    """Run shortest-augmenting-path for every free row until none remain.

    The outer loop walks free rows one at a time (as _ca_dense does,
    lapjv.cpp:293-315); each path search is internally vectorised.
    """

    return _bounded_augment_loop(
        m,
        C.shape[-1],
        lambda m: _one_path_round(C, m),
    )


def _multisource_path(
    C: jnp.ndarray, free_row: jnp.ndarray, row_of_col: jnp.ndarray, v: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dijkstra from ALL free rows simultaneously to the nearest free column.

    Equivalent to running find_path_dense from a virtual super-source joined
    to every free row (each normalised by its implicit potential u_f =
    min_j (C_fj - v_j), so every free row contributes a zero-distance column).
    The nearest free column over all sources is found in far fewer pops than
    a single-source search, and the classical settled-set dual update applies
    unchanged.  ``free_row`` is a boolean mask.
    """
    n = C.shape[-1]
    inf = jnp.asarray(jnp.inf, C.dtype)

    red = C - v[None, :]
    u_free = jnp.min(jnp.where(free_row[:, None], red, inf), axis=1)
    norm = jnp.where(free_row[:, None], red - u_free[:, None], inf)
    d0 = jnp.min(norm, axis=0)
    pred0 = jnp.argmin(norm, axis=0).astype(INT)

    return _dijkstra_to_free_col(C, row_of_col, v, d0=d0, pred0=pred0)


def _flip_to_source(
    final_j: jnp.ndarray,
    pred: jnp.ndarray,
    col_of_row: jnp.ndarray,
    row_of_col: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flip the alternating path back to whichever free row it reaches."""
    n = pred.shape[0]

    def cond(state):
        j, x, y, done, k = state
        return (~done) & (k <= n)

    def body(state):
        j, x, y, done, k = state
        i = pred[j]
        y = y.at[j].set(i)
        next_j = x[i]
        x = x.at[i].set(j)
        return next_j, x, y, next_j < 0, k + 1

    _, x, y, _, _ = lax.while_loop(
        cond,
        body,
        (final_j, col_of_row, row_of_col, jnp.asarray(False), jnp.asarray(0, INT)),
    )
    return x, y


def augment_all_multisource(C: jnp.ndarray, m: Matching) -> Matching:
    """Complete the matching: one multi-source search + flip per free row."""

    return _bounded_augment_loop(
        m,
        C.shape[-1],
        lambda m: _one_multisource_round(C, m),
    )


class _SweepState(NamedTuple):
    d: jnp.ndarray         # (n,) distances over columns
    pred_row: jnp.ndarray  # (n,) row through which d was achieved
    changed: jnp.ndarray
    sweeps: jnp.ndarray


def _sweep_shortest_paths(
    red: jnp.ndarray,       # (n, n) reduced costs (zero on matched edges)
    free_row: jnp.ndarray,  # (n,) bool
    x_safe: jnp.ndarray,    # (n,) matched column per row (0 for free rows)
    d0: jnp.ndarray,
    pred0: jnp.ndarray,
    max_sweeps: jnp.ndarray,
    free_col: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min-plus Bellman–Ford over columns, relaxed through ROWS.

    The column graph has edge j -> k of weight red[y_j, k]; substituting
    i = y_j (so j = x_i) turns each sweep into
        d_k = min(d_k, min_{matched i} (d[x_i] + red[i, k]))
    — a min-plus matvec against ``red`` ITSELF.  The column-indexed
    formulation would need the row-permuted gather ``red[y, :]`` (an O(n^2)
    data movement per sweep, and a mesh-wide all-to-all once rows are
    sharded); here the only gather is the O(n) ``d[x_i]``, the (n, n) work
    reads ``red`` in place, and the column-min reduction over the row axis
    shards cleanly (local reduce + pmin combine).  Self-edges (k = x_i)
    relax d[x_i] with itself and never pass the strict `<` test.

    Converges in (longest shortest-path hop count) sweeps, small when the
    duals are good.  Tracks pred_row[k] = row through which d_k was set.

    With ``free_col`` given, sweeping stops as soon as no distance at or
    below the current best free-column distance changes: along a shortest
    path distances are non-decreasing (weights >= 0), so once the region
    below that threshold is stable it is final — later sweeps only refine
    farther nodes, which the delta-capped dual update ignores anyway.
    """
    inf = jnp.asarray(jnp.inf, red.dtype)
    tol = 8.0 * jnp.finfo(red.dtype).eps

    def cond(s: _SweepState):
        return s.changed & (s.sweeps <= max_sweeps)

    def body(s: _SweepState) -> _SweepState:
        e = jnp.where(free_row, inf, s.d[x_safe])  # d at each row's matched col
        through = e[:, None] + red  # (i, k)
        best = jnp.min(through, axis=0)
        best_i = jnp.argmin(through, axis=0).astype(INT)
        improve = best < s.d
        d = jnp.where(improve, best, s.d)
        pred_row = jnp.where(improve, best_i, s.pred_row)
        if free_col is None:
            changed = jnp.any(improve)
        else:
            dmin_free = jnp.min(jnp.where(free_col, d, inf))
            thresh = dmin_free + tol * (1.0 + jnp.abs(dmin_free))
            changed = jnp.any(improve & (d <= thresh))
        return _SweepState(d, pred_row, changed, s.sweeps + 1)

    init = _SweepState(d0, pred0, jnp.asarray(True), jnp.asarray(0, INT))
    s = lax.while_loop(cond, body, init)
    return s.d, s.pred_row


# Fixed path-length buffer for the multi-augmentation flip.  Augmenting
# paths under good duals are a handful of hops; a sink whose path exceeds
# the cap is simply deferred to the next round (correctness unaffected).
_PATH_CAP = 64


def _flip_single_path(
    x: jnp.ndarray,
    y: jnp.ndarray,
    pred_row: jnp.ndarray,
    final_j: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flip one augmenting path with an n-bounded walk (no length cap)."""
    n = pred_row.shape[0]

    def cond(state):
        j, x, y, done, k = state
        return (~done) & (k <= n)

    def body(state):
        j, x, y, done, k = state
        i = pred_row[j]
        next_j = x[i]
        y = y.at[j].set(i)
        x = x.at[i].set(j)
        return next_j, x, y, next_j < 0, k + 1

    _, x, y, _, _ = lax.while_loop(
        cond, body, (final_j, x, y, jnp.asarray(False), jnp.asarray(0, INT))
    )
    return x, y


def _flip_disjoint_paths(
    x: jnp.ndarray,
    y: jnp.ndarray,
    pred_row: jnp.ndarray,
    cand: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flip a maximal set of vertex-disjoint augmenting paths.

    ``cand`` marks free columns whose shortest-path distance equals the
    round's delta (ties included): after the dual update every such path is
    tight, so flipping any ROW-disjoint subset preserves feasibility and
    complementary slackness (Hopcroft–Karp-style blocking augmentation on
    the tight graph; row-disjointness implies column-disjointness because a
    path's interior columns are the matched columns of its rows).

    Candidates are consumed lowest-index first; a path that touches a row
    already used this round is skipped (its sink stays free for the next
    round).  Each path costs O(_PATH_CAP) work — negligible next to the
    O(n^2) sweeps — and turns "one augmentation per round" into "one tie
    GROUP per round", the dominant round-count reduction on instances whose
    duals leave many equal-distance free columns (tie-heavy families, good
    GNN seeds).

    Progress guarantee: if EVERY candidate's path exceeds _PATH_CAP (then
    nothing is flipped, the next round's delta is 0, and the outer
    augmentation loop would spin forever), the nearest sink's path is
    flipped with an uncapped n-bounded walk instead.
    """
    n = pred_row.shape[0]
    iota_cap = lax.iota(INT, _PATH_CAP)

    def outer_cond(s):
        x, y, cand, used_row, k = s
        return jnp.any(cand) & (k < n)

    def outer_body(s):
        x, y, cand, used_row, k = s
        j0 = jnp.argmax(cand).astype(INT)  # first remaining candidate
        cand = cand.at[j0].set(False)

        # Walk the path, recording (row, col) hops; abort on a used row.
        def walk_cond(w):
            j, ok, done, L, rows, cols = w
            return (~done) & ok & (L < _PATH_CAP)

        def walk_body(w):
            j, ok, done, L, rows, cols = w
            i = pred_row[j]
            ok = ok & (~used_row[i])
            rows = rows.at[L].set(i)
            cols = cols.at[L].set(j)
            next_j = x[i]
            return next_j, ok, next_j < 0, L + 1, rows, cols

        _, ok, done, L, rows, cols = lax.while_loop(
            walk_cond,
            walk_body,
            (
                j0,
                jnp.asarray(True),
                jnp.asarray(False),
                jnp.asarray(0, INT),
                jnp.full((_PATH_CAP,), 0, INT),
                jnp.full((_PATH_CAP,), 0, INT),
            ),
        )
        ok = ok & done  # complete, conflict-free path

        # Commit the flips (no-op scatter when not ok / beyond the length).
        apply = ok & (iota_cap < L)
        rows_t = jnp.where(apply, rows, n)
        cols_t = jnp.where(apply, cols, n)
        x = x.at[rows_t].set(cols, mode="drop")
        y = y.at[cols_t].set(rows, mode="drop")
        used_row = used_row.at[rows_t].set(True, mode="drop")
        return x, y, cand, used_row, k + 1

    first_sink = jnp.argmax(cand).astype(INT)
    had_cand = jnp.any(cand)
    x2, y2, _, used_row, _ = lax.while_loop(
        outer_cond,
        outer_body,
        (x, y, cand, jnp.zeros((n,), jnp.bool_), jnp.asarray(0, INT)),
    )
    flipped_any = jnp.any(used_row)

    def fallback(_):
        # All candidates exceeded the path cap: uncapped single flip.
        return _flip_single_path(x, y, pred_row, first_sink)

    def keep(_):
        return x2, y2

    return lax.cond(had_cand & (~flipped_any), fallback, keep, None)


def augment_all_sweep(C: jnp.ndarray, m: Matching) -> Matching:
    """Augment free rows via min-plus sweep shortest paths, a tie GROUP per
    round.

    Per round: seed distances from all free rows at once, run Bellman–Ford
    sweeps (row-relaxation form, `_sweep_shortest_paths`) to exact distances,
    apply the classical settled-set dual update v += min(d, delta) - delta
    (identical to JV's READY-set update when distances are exact), then flip
    a maximal vertex-disjoint set of augmenting paths among ALL free columns
    at distance delta (`_flip_disjoint_paths`) — not just one.

    Replaces the pop-at-a-time Dijkstra (lapjv.cpp:221-282) whose ~n-iteration
    serial loop is latency-bound on TPU; each round costs a handful of fused
    O(n^2) VPU passes, all of which read the row-sharded reduced-cost matrix
    in place (no permuted gathers), so the same code runs partitioned over a
    mesh.
    """
    n = C.shape[-1]
    inf = jnp.asarray(jnp.inf, C.dtype)

    def body(m: Matching) -> Matching:
        x, y, v = m
        free_row = x < 0
        free_col = y < 0

        # Implicit row potentials: matched rows tight at their column; free
        # rows tightened to their row minimum.
        slack = C - v[None, :]
        x_safe = jnp.where(x >= 0, x, 0)
        u_matched = jnp.take_along_axis(slack, x_safe[:, None], axis=1)[:, 0]
        u_free = jnp.min(slack, axis=1)
        u = jnp.where(free_row, u_free, u_matched)
        # True reduced costs are >= 0; float rounding can leave values at
        # ~-ulp, and ANY negative weight lets the min-plus relaxation build a
        # negative-weight cycle: distances shrink by O(ulp) per sweep until
        # the sweep bound, and the predecessor graph acquires cycles that
        # break the augmenting flip (observed in f32 on tie-heavy
        # instances).  Clamping restores the non-negative-weight guarantee
        # at a distance perturbation bounded by n*ulp.
        red = jnp.maximum(slack - u[:, None], 0.0)  # zero on matched edges

        # Source layer: direct reach from any free row.
        src = jnp.where(free_row[:, None], red, inf)
        d0 = jnp.min(src, axis=0)
        pred0 = jnp.argmin(src, axis=0).astype(INT)

        d, pred_row = _sweep_shortest_paths(
            red, free_row, x_safe, d0, pred0, jnp.asarray(n, INT), free_col
        )

        d_free = jnp.where(free_col, d, inf)
        delta = jnp.min(d_free)

        # Dual update (exact distances make this JV's READY-set update).
        v = v + jnp.minimum(d, delta) - delta

        # All free columns at distance delta (a few-ulp relative tolerance —
        # truly tied paths differ only by summation rounding; anything
        # coarser flips near-tied paths whose slack then costs extra polish
        # rounds and dual drift) are tight sinks after the update; flip a
        # maximal disjoint set of their paths.
        tie_tol = 8.0 * jnp.finfo(C.dtype).eps * (1.0 + jnp.abs(delta))
        cand = free_col & (d_free <= delta + tie_tol)
        x, y = _flip_disjoint_paths(x, y, pred_row, cand)
        return Matching(x, y, v)

    return _bounded_augment_loop(m, n, body)


def polish_matching(
    C: jnp.ndarray, m: Matching, eps: Optional[float] = None
) -> Matching:
    """Exactness polish: re-augment rows whose matched edge is provably wrong.

    The warm greedy phase accepts edges within tight_eps of tight
    (solver/seeded.py); on instances whose optima are separated by less than
    that, such edges survive to termination and cost up to n*tight_eps of
    suboptimality.  This pass computes each matched row's complementary-
    slackness violation viol_i = slack[i, x_i] - min_j slack[i, j] (exactly
    zero when the matched edge is the row minimum — same floats, same
    reduction), unmatches every row with viol > eps, and re-runs the exact
    sweep augmentation.  One extra O(n^2) pass when nothing is wrong; exact
    re-matching of precisely the offending rows otherwise.
    """
    n = C.shape[-1]
    iota = lax.iota(INT, n)
    x, y, v = m
    slack = C - v[None, :]
    x_safe = jnp.where(x >= 0, x, 0)
    matched_slack = jnp.take_along_axis(slack, x_safe[:, None], axis=1)[:, 0]
    viol = jnp.where(x >= 0, matched_slack - jnp.min(slack, axis=1), 0.0)
    if eps is None:
        # A few ulps at the cost scale: catches real greedy mis-matches
        # (~tight_eps-sized) while ignoring rounding noise on rows the
        # augmentation matched correctly — re-augmenting those would cost
        # time without changing the answer.
        eps = 8.0 * float(jnp.finfo(C.dtype).eps)
        threshold = eps * (1.0 + jnp.max(jnp.abs(C)))
    else:
        threshold = jnp.asarray(eps, C.dtype)
    bad = viol > threshold

    x_new = jnp.where(bad, -1, x)
    y_new = (
        jnp.full((n + 1,), -1, INT)
        .at[jnp.where(x_new >= 0, x_new, n)]
        .max(jnp.where(x_new >= 0, iota, -1))
    )[:n]
    return augment_all_sweep(C, Matching(x_new, y_new, v))


def lapjv_single(C: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve one dense square LAP.  Returns (col_of_row, row_of_col, cost)."""
    from .seeded import jacobi_arr  # local import: avoids a module cycle

    n = C.shape[-1]
    m = column_reduction(C)
    m = jacobi_arr(C, m, max_rounds=max(64, n // 32))  # parallel ARR; see
    # the round-count note in solver/seeded.lapjv_seeded_single
    m = augment_all_sweep(C, m)
    return m.col_of_row, m.row_of_col, matching_cost(C, m.col_of_row)


@functools.partial(jax.jit, static_argnames=())
def lapjv_batch(C: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """vmapped batched solve over (B, n, n)."""
    return jax.vmap(lapjv_single)(C)
