"""Dual-potential math for the Linear Assignment Problem, batched for TPU.

Re-designs the reference's NumPy/sequential dual toolkit
(``/root/reference/solvers/advanced_dual.py:14-125`` and
``/root/reference/solvers/dual_computation.py:13-115``) as pure, jittable,
batch-polymorphic JAX functions.  All functions follow the convention:

  C : (..., n, n) cost matrix
  u : (..., n)    row dual potentials
  v : (..., n)    column dual potentials

Feasibility means ``C[i, j] - u[i] - v[j] >= -tol`` for all (i, j).

Notable TPU-first changes vs the reference:
  * ``duals_from_matching`` vectorises the reference's edge-list Bellman–Ford
    (dual_computation.py:34-52, a Python triple loop over n^2 edges) into a
    min-plus matrix-vector fixpoint: one relaxation round is a single masked
    row-reduction, iterated under ``lax.while_loop``.
  * ``project_feasible`` (advanced_dual.py:14-36) becomes a ``lax.while_loop``
    over alternating row/column min-cap reductions — each round is two MXU/VPU
    friendly reductions over the full (n, n) tile.
  * everything is mask-aware so padded batches of mixed problem sizes can run
    under one jit trace with static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "BIG",
    "masked_fill",
    "reduced_costs",
    "min_trick_v",
    "fast_min_trick",
    "robust_normalize",
    "tighten_rows",
    "project_feasible",
    "dual_objective",
    "check_dual_feasible",
    "check_complementary_slackness",
    "duals_from_matching",
    "center_gauge",
]

# Large-but-safe sentinel for masked entries.  The reference uses 1e6 for the
# same purpose in its training loss (train_one_gnn.py:188) and LAPMOD masking
# (lapmod_solver.py:47-69).  Must stay well inside float32 range so that
# differences of sentinels do not overflow.
BIG = 1.0e6


def _mask2d(mask: Optional[jnp.ndarray], n: int) -> Optional[jnp.ndarray]:
    """Outer product mask (…, n, n) from a row-validity mask (…, n)."""
    if mask is None:
        return None
    return mask[..., :, None] & mask[..., None, :]


def masked_fill(C: jnp.ndarray, mask: Optional[jnp.ndarray], fill: float = BIG) -> jnp.ndarray:
    """Replace entries outside the valid (row x col) block with ``fill``."""
    if mask is None:
        return C
    m2 = _mask2d(mask, C.shape[-1])
    return jnp.where(m2, C, jnp.asarray(fill, C.dtype))


def reduced_costs(C: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """r = C - u 1^T - 1 v^T (advanced_dual.py:39-53, without the shift)."""
    return C - u[..., :, None] - v[..., None, :]


def min_trick_v(
    C: jnp.ndarray, u: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Column duals via the min-trick: v_j = min_i (C_ij - u_i).

    For any u this yields a dual-feasible (u, v) pair; it is the core
    projection used throughout the reference (README.md:11-18, eval.py:119,
    gnn_benchmark.py:255).  A single column-min reduction on device.
    """
    red = C - u[..., :, None]
    if mask is not None:
        red = jnp.where(_mask2d(mask, C.shape[-1]), red, jnp.asarray(BIG, C.dtype))
    v = jnp.min(red, axis=-2)
    if mask is not None:
        v = jnp.where(mask, v, jnp.zeros_like(v))
    return v


def robust_normalize(
    C: jnp.ndarray, sentinel: float = 0.5e6, clip: float = 3.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-instance affine normalization robust to forbidden-edge sentinels.

    Plain (C - min) / (max - min) is what the model wants on dense instances,
    but sparse instances carry LARGE (1e6) sentinels on forbidden edges —
    dividing by the sentinel range squashes every real cost into [0, 1e-6]
    and blinds the model.  Here the scale comes from the sub-sentinel entries
    only; sentinel entries land above 1 and are clipped to ``clip`` so they
    remain recognisably "forbidden" without dominating.

    Returns (C_normalized, mn, a) with the affine map C = a*C' + mn exact on
    the sub-sentinel entries; duals predicted in normalized space map back as
    u = a*u' + mn (the solve itself always runs on the ORIGINAL C, so
    feasibility and exactness are unaffected by the clip).
    """
    is_real = C < jnp.asarray(sentinel, C.dtype)
    # +/-inf fills, NOT +/-BIG: with all real entries below -1e6 a -BIG fill
    # would WIN the max and inflate the scale — the exact sentinel-sets-the-
    # scale failure this function exists to prevent, recurring for large-
    # negative cost regimes.  The all-sentinel fallback below handles the
    # degenerate case the finite fill used to paper over.
    inf = jnp.asarray(jnp.inf, C.dtype)
    mn = jnp.min(jnp.where(is_real, C, inf), axis=(-2, -1), keepdims=True)
    mx = jnp.max(jnp.where(is_real, C, -inf), axis=(-2, -1), keepdims=True)
    # Degenerate (all-sentinel) instances fall back to plain min/max.
    any_real = jnp.any(is_real, axis=(-2, -1), keepdims=True)
    mn = jnp.where(any_real, mn, jnp.min(C, axis=(-2, -1), keepdims=True))
    mx = jnp.where(any_real, mx, jnp.max(C, axis=(-2, -1), keepdims=True))
    a = jnp.maximum(mx - mn, 1e-12)
    C_n = jnp.minimum((C - mn) / a, jnp.asarray(clip, C.dtype))
    return C_n, mn[..., 0, 0], a[..., 0, 0]


def fast_min_trick(
    C: jnp.ndarray, u: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """``min_trick_v`` routed through the Pallas streamed kernel on TPU.

    The XLA lowering of the unmasked column-min materialises the (C - u)
    intermediate and loses HBM bandwidth; the Pallas kernel
    (ops/pallas/colmin.py) streams row tiles once with a VMEM accumulator.
    Route table (re-measured round 5 on a quiet v5e; the round-3 rule kept
    XLA at n=2048 but Pallas has won at every measured size since r4 —
    696.6 vs 675.1 GB/s at 2048, 740.8 vs 659.7 at 4096, 812.8 vs 789.6 at
    8192; see bench_results/north_star_tpu_r5.json): Pallas for every
    n >= 2048.  Below 2048 a single pass is dispatch-bound and unmeasured —
    keep XLA.  Masked, non-f32, small-n, or non-TPU calls take the XLA path
    (identical semantics).
    """
    n = C.shape[-1]
    if (
        mask is not None
        or C.dtype != jnp.float32
        or n < 2048
        or jax.default_backend() != "tpu"
    ):
        return min_trick_v(C, u, mask)
    from .pallas.colmin import pallas_min_trick

    if C.ndim == 2:
        return pallas_min_trick(C, u)
    batch_shape = C.shape[:-2]
    B = 1
    for s in batch_shape:
        B *= s
    vf = jax.vmap(pallas_min_trick)(
        C.reshape((B, n, C.shape[-1])), u.reshape((B, n))
    )
    return vf.reshape(batch_shape + (n,))


def tighten_rows(
    C: jnp.ndarray, v: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Row tightening: u_i = min_j (C_ij - v_j).

    Guarantees each valid row has at least one zero reduced cost
    (the seeded solver's OPTIMIZATION 1, lapjv_seeded.cpp:64-73).
    """
    red = C - v[..., None, :]
    if mask is not None:
        red = jnp.where(_mask2d(mask, C.shape[-1]), red, jnp.asarray(BIG, C.dtype))
    u = jnp.min(red, axis=-1)
    if mask is not None:
        u = jnp.where(mask, u, jnp.zeros_like(u))
    return u


def project_feasible(
    C: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    max_rounds: int = 50,
    tol: float = 1e-12,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iteratively cap (u, v) until dual-feasible (advanced_dual.py:14-36).

    Alternates u <- min(u, min_j(C - v)) and v <- min(v, min_i(C - u)) under a
    ``lax.while_loop`` until the minimum reduced cost >= -tol or the round cap
    is hit.  Batch-polymorphic: the stopping test reduces over the whole batch
    so all instances iterate together (extra rounds are no-ops for already
    feasible instances since the caps are idempotent).
    """
    m2 = _mask2d(mask, C.shape[-1])
    big = jnp.asarray(BIG, C.dtype)

    def masked(red):
        return red if m2 is None else jnp.where(m2, red, big)

    def cond(state):
        rounds, u, v = state
        red = masked(reduced_costs(C, u, v))
        return (rounds < max_rounds) & (jnp.min(red) < -tol)

    def body(state):
        rounds, u, v = state
        u_cap = jnp.min(masked(C - v[..., None, :]), axis=-1)
        u = jnp.minimum(u, u_cap)
        v_cap = jnp.min(masked(C - u[..., :, None]), axis=-2)
        v = jnp.minimum(v, v_cap)
        return rounds + 1, u, v

    _, u, v = lax.while_loop(cond, body, (jnp.asarray(0), u, v))
    if mask is not None:
        u = jnp.where(mask, u, jnp.zeros_like(u))
        v = jnp.where(mask, v, jnp.zeros_like(v))
    return u, v


def dual_objective(
    u: jnp.ndarray, v: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Lower bound sum(u) + sum(v) on the optimal assignment cost."""
    if mask is not None:
        mf = mask.astype(u.dtype)
        return jnp.sum(u * mf, axis=-1) + jnp.sum(v * mf, axis=-1)
    return jnp.sum(u, axis=-1) + jnp.sum(v, axis=-1)


def check_dual_feasible(
    C: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    tol: float = 1e-8,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Boolean (per batch element): min reduced cost >= -tol.

    Jit-friendly analogue of advanced_dual.py:56-63 (which raises); host
    callers can assert on the returned array.
    """
    red = reduced_costs(C, u, v)
    if mask is not None:
        red = jnp.where(_mask2d(mask, C.shape[-1]), red, jnp.zeros_like(red))
    return jnp.min(red, axis=(-2, -1)) >= -tol


def check_complementary_slackness(
    C: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    col_of_row: jnp.ndarray,
    tol: float = 1e-6,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """|C[i, x_i] - u_i - v_{x_i}| <= tol on all matched edges.

    Matches the tightness check of advanced_dual.py:66-82.  ``col_of_row`` is
    the matching as a column index per row (x in the reference's JV API).
    """
    red = reduced_costs(C, u, v)
    matched = jnp.take_along_axis(red, col_of_row[..., :, None], axis=-1)[..., 0]
    slack_ok = jnp.abs(matched) <= tol
    if mask is not None:
        slack_ok = slack_ok | ~mask
    return jnp.all(slack_ok, axis=-1)


def duals_from_matching(
    C: jnp.ndarray,
    col_of_row: jnp.ndarray,
    tol: float = 1e-12,
    max_rounds: Optional[int] = None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reconstruct optimal duals from an optimal matching.

    TPU-native reformulation of the reference's difference-constraints
    Bellman–Ford (dual_computation.py:13-74).  The reference materialises n^2
    edges (p_i -> j, weight C[i, j] - C[i, p_i]) in a Python list and relaxes
    them one by one.  Observation: relaxing *all* edges once is equivalent to

        v_j <- min(v_j, min_i (C[i, j] - (C[i, p_i] - v[p_i])))

    i.e. a min-plus matvec of C against the vector t_i = C[i, p_i] - v[p_i].
    We iterate that fixpoint under ``lax.while_loop`` (at most n-1 rounds, in
    practice a handful).  Afterwards u_i = C[i, p_i] - v[p_i] on matched rows,
    and both vectors are gauge-fixed by the mean shift exactly as the
    reference does (dual_computation.py:61-64).

    Args:
      C: (..., n, n) costs.
      col_of_row: (..., n) int — column matched to each row (a permutation).
      mask: (..., n) optional row-validity mask for padded batches.

    Returns:
      (u, v) optimal dual potentials.
    """
    n = C.shape[-1]
    if max_rounds is None:
        max_rounds = n  # Bellman-Ford converges in <= n-1 rounds.
    big = jnp.asarray(BIG, C.dtype)
    m2 = _mask2d(mask, n)

    # Per-row matched cost C[i, p_i].
    c_match = jnp.take_along_axis(C, col_of_row[..., :, None], axis=-1)[..., 0]

    def relax_once(v):
        # t_i = C[i, p_i] - v[p_i]  (tentative u from current v)
        v_p = jnp.take_along_axis(v, col_of_row, axis=-1)
        t = c_match - v_p
        cand = C - t[..., :, None]
        if m2 is not None:
            cand = jnp.where(m2, cand, big)
        return jnp.minimum(v, jnp.min(cand, axis=-2))

    def cond(state):
        rounds, v, changed = state
        return (rounds < max_rounds) & changed

    def body(state):
        rounds, v, _ = state
        v_new = relax_once(v)
        changed = jnp.any(v_new < v - tol)
        return rounds + 1, v_new, changed

    v0 = jnp.zeros(C.shape[:-1], C.dtype)
    _, v, _ = lax.while_loop(cond, body, (jnp.asarray(0), v0, jnp.asarray(True)))

    u = c_match - jnp.take_along_axis(v, col_of_row, axis=-1)

    # Gauge fix: shift = (mean(u) + mean(v)) / 2 (dual_computation.py:61-64).
    if mask is not None:
        mf = mask.astype(C.dtype)
        cnt = jnp.maximum(jnp.sum(mf, axis=-1, keepdims=True), 1.0)
        mu = jnp.sum(u * mf, axis=-1, keepdims=True) / cnt
        mv = jnp.sum(v * mf, axis=-1, keepdims=True) / cnt
    else:
        mu = jnp.mean(u, axis=-1, keepdims=True)
        mv = jnp.mean(v, axis=-1, keepdims=True)
    shift = (mu + mv) / 2.0
    u = u - shift
    v = v + shift
    if mask is not None:
        u = jnp.where(mask, u, jnp.zeros_like(u))
        v = jnp.where(mask, v, jnp.zeros_like(v))
    return u, v


def center_gauge(
    u: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Mean-center u per instance (the models' gauge fix, one_gnn.py:111-113)."""
    if mask is not None:
        mf = mask.astype(u.dtype)
        cnt = jnp.maximum(jnp.sum(mf, axis=-1, keepdims=True), 1.0)
        mean_u = jnp.sum(u * mf, axis=-1, keepdims=True) / cnt
        return jnp.where(mask, u - mean_u, jnp.zeros_like(u))
    return u - jnp.mean(u, axis=-1, keepdims=True)
