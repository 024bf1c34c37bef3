"""Entropic (log-domain Sinkhorn) dual refinement — a model-free seed sharpener.

Net-new vs the reference (no counterpart; its seeds are the GNN prediction,
row/col minima, or the oracle — gnn/eval.py + solvers/generators.py).  The
dual of entropy-regularised optimal transport converges to a LAP dual point
as the temperature ``eps -> 0``; running a few log-domain Sinkhorn sweeps
under an ``eps``-halving ladder from ANY starting duals therefore drives the
dual objective to within O(eps * n) of optimal — model-free, exactly the
alternating-min structure the TPU's VPU likes (row/col logsumexp reductions
over the cost matrix, all fused by XLA, ~2 matrix reads per sweep).

Why this exists: on the ``noisy_linear`` family both GNNs and the analytic
rank-1 seed plateau at gauge u-MAE ~0.037 / pre-solve greedy gap ~17 —
pooled per-row context cannot express the globally coupled sorted-factor
dual structure (docs/ACCURACY_LADDER.md, round 3; the round-3 ridge probe
on rank-1 residuals confirms per-row features explain <10% of the error).
Sinkhorn refinement is the closing move: it needs no learned structure at
all and measured (round 4, n=512, noise=0.1): dual gap 8.9 -> 0.08,
pre-solve greedy gap 16.6 -> ~2-4, gauge u-MAE 0.037 -> ~0.015.  The
residual u-MAE is dual-polytope NON-UNIQUENESS, not error: the entropic
path converges to the max-entropy dual point while the stored oracle is the
min-plus extreme point, and with the dual gap at ~1e-2 both are essentially
optimal dual solutions that simply sit on different faces.

A caveat that shapes the serving integration (see ``collision_mask``): an
interior/max-entropy dual point spreads near-tightness over many edges, so
on tie-heavy families a REFINED seed can make the seeded solver's greedy
phase collide catastrophically (measured: tie@2048 8.2 s -> 12.7 s) even
though its objective is near-optimal, while an extreme-point seed (the GNN
on that family) solves in ~90 ms.  The unique-argmin collision proxy below
is how the pipeline's auto-selection vetoes such seeds.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "sinkhorn_refine",
    "auto_select_seed",
    "uniq_argmin_count",
    "collision_veto_mask",
    "DEFAULT_EPS_SCHEDULE",
]

# Relative-to-scale temperature ladder.  Wide on purpose (>2 decades): the
# per-instance scale estimate only needs to land the informative rungs
# somewhere inside the ladder, so a 3x scale misestimate costs nothing.
# Tuned round 4 for serving cost: 4 rungs x 8 sweeps = 64 matrix reads
# reaches noisy_linear greedy gap ~4.2 / u-MAE 0.0156 (vs the original
# 7x10 ladder's 4.0 / 0.0152 at 140 reads — the extra 76 reads bought
# ~2% and showed up as ~15 ms on every n=2048 resident predict).
DEFAULT_EPS_SCHEDULE: Tuple[float, ...] = (0.05, 0.01, 0.002, 4e-4)
DEFAULT_ITERS_PER_EPS = 8
# A colder finishing rung, appended to the DEFAULT schedule at n >= 4096
# only (n is static at trace time): large instances' per-edge dual slack
# shrinks like 1/n, so tight-edge formation needs a colder finish — at
# n=8192 this rung halves the seeded solver's free-row tail (1331 -> 594
# after greedy) and cuts the warm solve 2.87 -> 2.40 s for ~30 ms of
# refinement (measured on-chip, uniform).  At n=512 the same rung HURTS
# the greedy gap on tie-prone families (noisy_linear 4.2 -> 5.5 — a too-
# extreme point collides greedy), hence the size gate.
COLD_FINISH_EPS = 8e-5
COLD_FINISH_MIN_N = 4096


def _robust_scale(cost: jnp.ndarray) -> jnp.ndarray:
    """Per-instance cost spread (q90 - q10), sentinel-robust via the loss's
    clip; floors at a tiny positive value so constant matrices are inert.

    Estimated on a ~64k-element strided subsample: an exact quantile sorts
    all n^2 entries (a ~10-20 ms hidden cost at n=2048 for a number that
    only has to be right to within ~3x — see the ladder comment).  The
    subsample strides BOTH matrix axes before flattening: flattening the
    full (row, col)-sharded matrix first would all-gather it under GSPMD,
    while a per-axis strided slice stays shard-local and only the ~64k
    sample moves.
    """
    n_r, n_c = cost.shape[-2], cost.shape[-1]
    red = 1
    while (n_r // red) * (n_c // red) > 65536:
        red *= 2
    sample = cost[..., ::red, ::red].reshape(cost.shape[0], -1)
    q = jnp.quantile(sample, jnp.asarray([0.1, 0.9]), axis=-1)
    return jnp.maximum(q[1] - q[0], 1e-6)


def sinkhorn_refine(
    cost: jnp.ndarray,
    u0: jnp.ndarray,
    eps_schedule: Sequence[float] = DEFAULT_EPS_SCHEDULE,
    iters_per_eps: int = DEFAULT_ITERS_PER_EPS,
    clip_sentinels: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refine row duals ``u0`` toward dual optimality; returns feasible (u, v).

    Batched and jittable; ``cost`` is (B, n, n), ``u0`` is (B, n).  Uniform
    marginals (every row/col matched once) make the entropic dual update a
    plain logsumexp:  u_i <- -eps logsumexp_j((v_j - C_ij)/eps), and
    symmetrically for v.  The ladder multiplies ``eps_schedule`` by a
    per-instance robust spread, so one schedule serves every family.

    Sentinel handling mirrors the training loss (train/loss.py): refinement
    runs on the sentinel-clipped matrix, which is entrywise <= the true one,
    so the final min-trick projection against the TRUE matrix returns a pair
    that is feasible for it (clipped-feasibility implies true-feasibility,
    and the projection only lowers v further).

    Cost: ``2 * len(eps_schedule) * iters_per_eps`` reads of C — 64 at the
    defaults, ~1-2 ms at n=2048 on TPU HBM and far less than one solve.
    """
    if cost.ndim == 2:  # unbatched (n, n) instance, like rank1_duals
        u, v = sinkhorn_refine(
            cost[None], u0[None], eps_schedule, iters_per_eps, clip_sentinels
        )
        return u[0], v[0]
    # Value comparison, not identity: callers passing an equal-by-value
    # copy (list/tuple) of the default schedule must not silently lose the
    # large-n cold finishing rung (ADVICE r4).
    if (
        tuple(eps_schedule) == DEFAULT_EPS_SCHEDULE
        and cost.shape[-1] >= COLD_FINISH_MIN_N
    ):
        eps_schedule = DEFAULT_EPS_SCHEDULE + (COLD_FINISH_EPS,)
    cost_f = cost.astype(jnp.float32)
    if clip_sentinels:
        from ..train.loss import clip_cost_sentinels

        cost_r = clip_cost_sentinels(cost_f)
    else:
        cost_r = cost_f
    scale = _robust_scale(cost_r)[:, None, None]

    u = u0.astype(jnp.float32)
    v = jnp.min(cost_r - u[..., :, None], axis=-2)

    def sweep(carry, eps_rel):
        u, v = carry
        eps = eps_rel * scale

        def one(_, uv):
            u, v = uv
            u = -jnp.squeeze(eps, -1) * jax.nn.logsumexp(
                (v[..., None, :] - cost_r) / eps, axis=-1
            )
            v = -jnp.squeeze(eps, -1) * jax.nn.logsumexp(
                (u[..., :, None] - cost_r) / eps, axis=-2
            )
            return u, v

        u, v = jax.lax.fori_loop(0, iters_per_eps, one, (u, v))
        return (u, v), None

    (u, v), _ = jax.lax.scan(
        sweep, (u, v), jnp.asarray(eps_schedule, jnp.float32)
    )
    # Exact feasibility on the TRUE matrix IN ITS ORIGINAL DTYPE: entropic
    # duals carry O(eps) slack violations; the alternating min-trick
    # projection removes them.  Both final projections run against ``cost``
    # un-cast (ADVICE r4: projecting against the f32 image left ~1e-7
    # relative dual infeasibility for float64 inputs); for f32 inputs this
    # is bit-identical to projecting against ``cost_f``.
    u = jnp.min(cost - v.astype(cost.dtype)[..., None, :], axis=-1)
    v = jnp.min(cost - u[..., :, None], axis=-2)
    return u, v


def auto_select_seed(
    cost: jnp.ndarray, u_gnn: jnp.ndarray, min_trick=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The serving 'auto' seed policy, in ONE place (jittable).

    rank-1 analytic candidate alongside the model seed -> refine the
    objective winner with Sinkhorn ascent -> final three-way selection by
    dual objective under the unique-argmin collision veto.  Used verbatim
    by the single-device pipeline, the GSPMD row-sharded predict, and the
    evaluation ladder so all three always score the same posture
    (pipeline.predict_duals_fn, parallel/sharded.make_sharded_predict,
    evaluation.DualGNNPredictor).

    Every candidate's min-trick projection is computed exactly once: the
    projections feed the objective comparison, the winner pick, AND the
    veto's argmin pass, so the whole policy costs 4 + len(eps ladder)
    reads of C beyond the model forward (naive composition of
    select_best_seed calls would re-project every candidate twice).

    ``min_trick`` overrides the projection kernel (pass the plain XLA
    ``min_trick_v`` from GSPMD-sharded programs — see select_best_seed).
    """
    if min_trick is None:
        from .dual import fast_min_trick as min_trick

    if cost.ndim == 2:
        u, v = auto_select_seed(cost[None], u_gnn[None], min_trick)
        return u[0], v[0]

    from .rank1 import rank1_duals

    u_r1, _ = rank1_duals(cost)
    us = [u_gnn, u_r1]
    vs = [min_trick(cost, u) for u in us]
    objs = [jnp.sum(u, axis=-1) + jnp.sum(v, axis=-1) for u, v in zip(us, vs)]
    pick01 = jnp.stack(objs, 0).argmax(axis=0)  # (B,)
    take = jax.vmap(lambda arr, k: arr[k], in_axes=(1, 0))
    u_best = take(jnp.stack(us, 0), pick01)
    u_sk, v_sk = sinkhorn_refine(cost, u_best)  # returns the projected pair

    us.append(u_sk)
    vs.append(v_sk)
    objs.append(jnp.sum(u_sk, axis=-1) + jnp.sum(v_sk, axis=-1))
    uniq = jnp.stack(
        [uniq_argmin_count(cost, u, v) for u, v in zip(us, vs)], 0
    )
    ok = collision_veto_mask(uniq, cost.shape[-1])
    obj = jnp.where(ok, jnp.stack(objs, 0), -jnp.inf)
    best = jnp.argmax(obj, axis=0)
    return take(jnp.stack(us, 0), best), take(jnp.stack(vs, 0), best)


def collision_veto_mask(uniq: jnp.ndarray, n: int) -> jnp.ndarray:
    """The ONE collision-veto rule, shared by every seed-selection site.

    ``uniq`` is (K, ...) unique-argmin counts per candidate; a candidate is
    vetoed when its count trails the per-instance best by more than n/4.
    Relative, so it never disqualifies everything (the best candidate is
    always kept) and degrades to pure objective selection when candidates
    are comparable.  Factored here (ADVICE r4) so `select_best_seed` and
    `auto_select_seed` cannot drift apart.
    """
    return uniq >= jnp.max(uniq, axis=0, keepdims=True) - n // 4


def uniq_argmin_count(cost: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Number of distinct per-row argmin columns of the reduced matrix (B,).

    A collision proxy for seeded-solve cost: the seeded solver's greedy
    phase matches rows to their tight columns, and rows whose argmin
    columns collide stay free for the O(n) augmentation phase.  Interior
    (entropy-smoothed) dual points can be near-optimal in objective yet
    collapse this count on tie-heavy instances — the measured tie@2048
    8 s -> 13 s regression — so the auto seed selection uses this count as
    a veto, not the objective alone (ops/rank1.select_best_seed).
    """
    am = jnp.argmin(cost - u[..., :, None] - v[..., None, :], axis=-1)
    s = jnp.sort(am, axis=-1)
    return 1 + jnp.sum(s[..., 1:] != s[..., :-1], axis=-1)
