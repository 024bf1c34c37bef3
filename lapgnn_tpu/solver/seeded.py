"""Seeded (warm-started) Jonker–Volgenant solver, batched in pure JAX.

TPU-native re-design of the reference's novel C++ kernel
(``/root/reference/LAP/_lapjv_cpp/lapjv_seeded.cpp:19-173``).  Phase map:

  reference (sequential C++)                 here (batched JAX)
  -------------------------------------      ---------------------------------
  pairwise feasibility projection (:36-52)   alternating min-cap projection
                                             (one ``project_feasible`` round —
                                             always yields feasible duals, so
                                             the reference's -3 "infeasible"
                                             error path cannot occur)
  row tightening u=min_j(C-v) (:64-73)       ``tighten_rows`` reduction
  greedy tight-edge matching (:79-93)        parallel proposal rounds with
                                             deterministic-hash tie-breaking
                                             (Luby-style maximal matching)
  tight-edge density count (:104-113)        one masked count reduction
  fallback to cold JV if < 1.2 n (:116-125)  ``lax.cond`` into column
                                             reduction (jv.column_reduction)
  micro-ARR on free rows (:134-159)          vectorised two-min per free row,
                                             per-column max-delta scatter
  augmentation only (_ca_dense) (:161-167)   jv.augment_all_sweep (tie-group multi-path)

Only the column duals v actually influence the result: the row-tightening
phase overwrites u entirely (true in the reference as well), so the projection
here just caps v against the seed u before discarding u.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .jv import (
    INT,
    Matching,
    augment_all_sweep,
    column_reduction,
    matching_cost,
    polish_matching,
)

__all__ = [
    "default_tight_eps",
    "greedy_tight_matching",
    "lapjv_seeded_single",
    "lapjv_seeded_batch",
    "SeededResult",
]

# Fallback threshold: density of tight edges below which the seed is deemed
# useless and a cold solve runs instead (lapjv_seeded.cpp:116).
FALLBACK_DENSITY = 1.2


def default_tight_eps(dtype) -> float:
    """Tightness tolerance matched to precision.

    The reference uses max(eps, 1e-9) in float64 (lapjv_seeded.cpp:76).  In
    float32 that is below machine epsilon for O(1) costs, so we widen to 1e-5.
    """
    if jnp.dtype(dtype) == jnp.float64:
        return 1e-9
    return 1e-5


def _hash_scores(n: int, rnd: jnp.ndarray) -> jnp.ndarray:
    """Deterministic per-(row, col, round) pseudo-random int32 scores.

    Cheap Weyl/multiplicative mixing on broadcasted iotas; used to spread
    proposals across columns on tie-heavy instances where an ascending-column
    scan would serialise (one match per round).
    """
    i = lax.broadcasted_iota(jnp.uint32, (n, n), 0)
    j = lax.broadcasted_iota(jnp.uint32, (n, n), 1)
    r = rnd.astype(jnp.uint32)
    h = i * jnp.uint32(0x9E3779B1) + j * jnp.uint32(0x85EBCA77) + r * jnp.uint32(0xC2B2AE3D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x27D4EB2F)
    h = h ^ (h >> 13)
    # Strictly below int32-max: 0x7FFFFFFF is the 'unavailable' sentinel in
    # greedy_tight_matching; a score equal to it would let a free row whose
    # only available column hashes there propose column 0 instead (duplicate
    # column in the matching, ~2^-31 per row-round).
    return jnp.minimum(h & jnp.uint32(0x7FFFFFFF), jnp.uint32(0x7FFFFFFE)).astype(INT)


class _GreedyState(NamedTuple):
    col_of_row: jnp.ndarray
    row_of_col: jnp.ndarray
    rnd: jnp.ndarray
    progressed: jnp.ndarray


def greedy_tight_matching(tight: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Maximal matching on the tight-edge graph via parallel proposal rounds.

    Each round: every free row proposes one available tight column (round 0:
    the lowest column index, mirroring the reference's ascending scan
    lapjv_seeded.cpp:81-93; later rounds: hash-scored to break degeneracy);
    each column accepts the lowest-index proposing row.  Repeats until no row
    can propose.  Produces a maximal matching — the same guarantee as the
    reference's sequential greedy, though possibly a different one.
    """
    n = tight.shape[-1]
    iota = lax.iota(INT, n)
    col_ids = lax.broadcasted_iota(INT, (n, n), 1)

    def cond(s: _GreedyState):
        return s.progressed

    def body(s: _GreedyState) -> _GreedyState:
        avail = tight & (s.row_of_col < 0)[None, :] & (s.col_of_row < 0)[:, None]
        has_any = jnp.any(avail, axis=1)

        score = lax.cond(
            s.rnd == 0,
            lambda: col_ids,
            lambda: _hash_scores(n, s.rnd),
        )
        score = jnp.where(avail, score, jnp.iinfo(jnp.int32).max)
        prop_j = jnp.argmin(score, axis=1).astype(INT)
        prop_j_safe = jnp.where(has_any, prop_j, n)

        # Column-side acceptance: lowest proposing row wins (scatter-min).
        winner = (
            jnp.full((n + 1,), n, INT)
            .at[prop_j_safe]
            .min(jnp.where(has_any, iota, n))
        )
        won = has_any & (winner[prop_j_safe] == iota)

        x = jnp.where(won, prop_j, s.col_of_row)
        y_scatter = (
            jnp.full((n + 1,), -1, INT)
            .at[jnp.where(won, prop_j, n)]
            .max(jnp.where(won, iota, -1))
        )[:n]
        y = jnp.where(y_scatter >= 0, y_scatter, s.row_of_col)

        return _GreedyState(x, y, s.rnd + 1, jnp.any(won))

    init = _GreedyState(
        col_of_row=jnp.full((n,), -1, INT),
        row_of_col=jnp.full((n,), -1, INT),
        rnd=jnp.asarray(0, INT),
        progressed=jnp.asarray(True),
    )
    s = lax.while_loop(cond, body, init)
    return s.col_of_row, s.row_of_col


class _ArrState(NamedTuple):
    rnd: jnp.ndarray
    m: Matching
    progressed: jnp.ndarray


def jacobi_arr(
    C: jnp.ndarray,
    m: Matching,
    max_rounds: int = 64,
    min_delta: float = 0.0,
) -> Matching:
    """Parallel (Jacobi) augmenting row reduction — an epsilon=0 auction.

    The reference's ARR (lapjv.cpp:76-149) walks free rows one at a time:
    take the cheapest column j1, lower v[j1] by the gap to the second
    cheapest, kick the previous owner.  Here *all* free rows bid in the same
    round (one O(n^2) two-min reduction); each column accepts the bid with
    the largest gap (ties to the lowest row) and lowers its potential by that
    gap.  Invariants preserved every round:

      * dual feasibility: v only decreases, so reduced costs only grow;
      * matched edges stay tight: a held column's potential is untouched
        until its owner is kicked, and other columns only become *more*
        expensive, so a held edge remains its row's minimum.

    Rows whose two-min gap is <= ``min_delta`` do not bid (no price progress
    to be made) and are left for the exact Dijkstra phase, as is anything
    still free after ``max_rounds``.  Exactness of the overall solve is
    therefore unaffected — this pass only shrinks the sequential workload.
    """
    n = C.shape[-1]
    iota = lax.iota(INT, n)
    col_ids = lax.broadcasted_iota(INT, (n, n), 1)
    inf = jnp.asarray(jnp.inf, C.dtype)
    neg_inf = jnp.asarray(-jnp.inf, C.dtype)

    def cond(s: _ArrState):
        return (s.rnd < max_rounds) & s.progressed

    def body(s: _ArrState) -> _ArrState:
        x, y, v = s.m.col_of_row, s.m.row_of_col, s.m.v
        red = C - v[None, :]
        j1 = jnp.argmin(red, axis=1).astype(INT)
        min1 = jnp.take_along_axis(red, j1[:, None], axis=1)[:, 0]
        min2 = jnp.min(jnp.where(col_ids == j1[:, None], inf, red), axis=1)
        delta = min2 - min1

        bid = (x < 0) & (delta > min_delta) & jnp.isfinite(min2)
        j1_safe = jnp.where(bid, j1, n)

        # Column-side acceptance: largest gap wins, ties to the lowest row.
        col_best = (
            jnp.full((n + 1,), neg_inf, C.dtype)
            .at[j1_safe]
            .max(jnp.where(bid, delta, neg_inf))
        )
        cand = bid & (delta >= col_best[j1_safe])
        win_row = (
            jnp.full((n + 1,), n, INT)
            .at[jnp.where(cand, j1, n)]
            .min(jnp.where(cand, iota, n))
        )
        won = cand & (win_row[j1_safe] == iota)

        # Price drop on won columns (one winner per column).
        dv = (
            jnp.zeros((n + 1,), C.dtype)
            .at[jnp.where(won, j1, n)]
            .max(jnp.where(won, delta, 0.0))
        )
        v = v - dv[:n]

        new_owner = (
            jnp.full((n + 1,), -1, INT)
            .at[jnp.where(won, j1, n)]
            .max(jnp.where(won, iota, -1))
        )[:n]
        kicked = jnp.where(new_owner >= 0, y, -1)
        x = x.at[jnp.where(kicked >= 0, kicked, n)].set(-1, mode="drop")
        x = jnp.where(won, j1, x)
        y = jnp.where(new_owner >= 0, new_owner, y)

        return _ArrState(s.rnd + 1, Matching(x, y, v), jnp.any(won))

    s = lax.while_loop(
        cond, body, _ArrState(jnp.asarray(0, INT), m, jnp.asarray(True))
    )
    return s.m


class SeededResult(NamedTuple):
    col_of_row: jnp.ndarray
    row_of_col: jnp.ndarray
    cost: jnp.ndarray
    used_fallback: jnp.ndarray
    # Final column duals: the optimality certificate.  With u_i implicitly
    # C[i, x_i] - v[x_i], min_j (C_ij - u_i - v_j) >= -tol certifies the
    # assignment within n*tol of optimal (enables the f64 certify/polish
    # path for the f32 device solver, solver/verification.py).
    v: jnp.ndarray


def lapjv_seeded_single(
    C: jnp.ndarray,
    u_seed: jnp.ndarray,
    v_seed: jnp.ndarray,
    eps: float = 1e-12,
    project_rounds: int = 2,
    gate: str = "density",
    free_rows_frac: float = 0.5,
    arr_rounds: Optional[int] = None,
) -> SeededResult:
    """Warm-started dense JV solve for one square instance.

    Mirrors lapjv_seeded.cpp:19-173 end to end; exactly optimal regardless of
    seed quality (a bad seed only costs time via the cold fallback).

    ``gate`` selects the cold-fallback criterion:
      * "density": tight-edge count < 1.2 n (reference-faithful,
        lapjv_seeded.cpp:116).  Overly conservative for min-trick seeds —
        tightening guarantees ~n tight edges that may form a near-perfect
        matching while still failing the 1.2 n count (metric family).
      * "free_rows": fall back only if the greedy tight matching leaves more
        than ``free_rows_frac`` of the rows unmatched — a direct measure of
        the augmentation work remaining (new in this framework).  Overly
        conservative on tie-heavy families where greedy maximal matching
        flirts with its 1/2 worst case (clustered).
      * "both": fall back only when BOTH heuristics deem the seed bad —
        dominates either alone across the families.
      * "never": always run the warm path (still exactly optimal).
    """
    n = C.shape[-1]
    tight_eps = jnp.asarray(max(eps, default_tight_eps(C.dtype)), C.dtype)

    # Feasibility projection on the seed (caps are idempotent + monotone).
    u = u_seed.astype(C.dtype)
    v = v_seed.astype(C.dtype)
    for _ in range(project_rounds):
        u = jnp.minimum(u, jnp.min(C - v[None, :], axis=1))
        v = jnp.minimum(v, jnp.min(C - u[:, None], axis=0))

    # Row tightening: u = min_j (C - v) => every row has a zero reduced cost.
    u = jnp.min(C - v[None, :], axis=1)
    red = C - u[:, None] - v[None, :]
    tight = jnp.abs(red) <= tight_eps

    x, y = greedy_tight_matching(tight)

    # Seed-quality gates (density: lapjv_seeded.cpp:104-125).
    n_tight = jnp.sum(tight.astype(jnp.float32))
    density_bad = n_tight < jnp.asarray(FALLBACK_DENSITY * n, jnp.float32)
    n_free = jnp.sum((x < 0).astype(jnp.float32))
    free_bad = n_free > jnp.asarray(free_rows_frac * n, jnp.float32)
    if gate == "density":
        use_fallback = density_bad
    elif gate == "free_rows":
        use_fallback = free_bad
    elif gate == "both":
        use_fallback = density_bad & free_bad
    elif gate == "never":
        use_fallback = jnp.asarray(False)
    else:
        raise ValueError(f"unknown gate '{gate}'")

    # Cold fallback start state is a per-field SELECT, not a lax.cond: the
    # cold branch (column_reduction) is only ~3 dense passes, a batched
    # lax.cond executes both branches under vmap anyway (so the serving
    # path always paid for both), and the select keeps the whole function
    # one straight-line program — no conditional boundary for layout/fusion
    # decisions to stop at.  Measured equal-or-better at n=8192 on TPU.
    #
    # The warm start state needs no micro-ARR phase: the reference's
    # micro-ARR (lapjv_seeded.cpp:134-159) is a provable no-op in this
    # design — u = min_j(C - v) makes every row's argmin reduced cost
    # exactly 0.0 (same-float subtraction), so each free row's best column
    # is tight, and greedy_tight_matching is MAXIMAL, so a free tight
    # column cannot face a free row.
    m_cold = column_reduction(C)
    m = Matching(
        col_of_row=jnp.where(use_fallback, m_cold.col_of_row, x),
        row_of_col=jnp.where(use_fallback, m_cold.row_of_col, y),
        v=jnp.where(use_fallback, m_cold.v, v),
    )
    # Parallel ARR collapses most remaining free rows with O(n^2)-per-round
    # vector work; min-plus sweep augmentation (which flips a whole
    # tied-distance GROUP of paths per round) finishes the rest.  Rounds
    # scale with n by default; ``arr_rounds`` overrides for tuning.
    # n//32 beats n//16 on the chip at large n: the ARR's long tail wins
    # ~1 row per O(n^2) round, and handing the tail to the sweep earlier is
    # cheaper (measured n=8192, GNN seeds: 256 rounds -> 1.86 s total vs
    # 512 rounds -> 2.25 s; the curve is flat 128-256, so the exact knee
    # doesn't matter).
    rounds = arr_rounds if arr_rounds is not None else max(64, n // 32)
    m = jacobi_arr(C, m, max_rounds=rounds)
    m = augment_all_sweep(C, m)
    # Exactness polish: the greedy phase accepts edges within tight_eps of
    # tight; on optima separated by less than that, re-augment the offending
    # rows exactly (one O(n^2) check when nothing is wrong).
    m = polish_matching(C, m)
    return SeededResult(
        col_of_row=m.col_of_row,
        row_of_col=m.row_of_col,
        cost=matching_cost(C, m.col_of_row),
        used_fallback=use_fallback,
        v=m.v,
    )


@functools.partial(
    jax.jit,
    static_argnames=("eps", "project_rounds", "gate", "free_rows_frac", "arr_rounds"),
)
def lapjv_seeded_batch(
    C: jnp.ndarray,
    u_seed: jnp.ndarray,
    v_seed: jnp.ndarray,
    eps: float = 1e-12,
    project_rounds: int = 2,
    gate: str = "density",
    free_rows_frac: float = 0.5,
    arr_rounds: Optional[int] = None,
) -> SeededResult:
    """vmapped batched seeded solve over (B, n, n) with (B, n) seeds."""
    fn = functools.partial(
        lapjv_seeded_single,
        eps=eps,
        project_rounds=project_rounds,
        gate=gate,
        arr_rounds=arr_rounds,
        free_rows_frac=free_rows_frac,
    )
    return jax.vmap(fn)(C, u_seed, v_seed)
