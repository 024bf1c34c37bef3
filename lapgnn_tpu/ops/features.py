"""Feature engineering for OneGNN / DualGNN, batched in JAX.

Re-implements the reference's NumPy/torch feature stack
(``/root/reference/gnn/features.py:21-355``) as jittable, batch-polymorphic
functions.  Channel-for-channel parity with ``compute_row_features`` (the 21-D
OneGNN features, features.py:161-243) and ``compute_features`` (14-D node +
10-channel edge features for DualGNN, features.py:49-153) is covered by unit
tests against an independent NumPy oracle.

TPU notes: the sort-based statistics (median / MAD / k-smallest / difficulty)
use a single ``jnp.sort`` per row — one bitonic sort on device — from which
every order statistic is sliced, rather than the reference's four separate
partition/sort calls.  Everything else is single-pass VPU reductions that XLA
fuses into a handful of kernels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "POS_FREQS",
    "TAU",
    "EPS",
    "ROW_FEATURE_DIM",
    "NODE_FEATURE_DIM",
    "EDGE_FEATURE_DIM",
    "positional_encodings",
    "row_features",
    "fast_row_features",
    "graph_features",
    "GraphFeatures",
]

# Constants mirrored from features.py:16-18.
POS_FREQS = (1, 2, 4, 8)
TAU = 1e-3
EPS = 1e-9

ROW_FEATURE_DIM = 13 + 2 * len(POS_FREQS)  # 21
NODE_FEATURE_DIM = 6 + 2 * len(POS_FREQS)  # 14
EDGE_FEATURE_DIM = 10


def positional_encodings(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """8-D sinusoidal index encodings (features.py:21-31).

    sin/cos of 2*pi*pos*f/max(1, n-1) for f in (1, 2, 4, 8) -> (n, 8).
    """
    pos = lax.iota(jnp.float32, n).reshape(n, 1)
    scale = float(max(1, n - 1))
    freqs = jnp.asarray(POS_FREQS, jnp.float32).reshape(1, len(POS_FREQS))
    angle = 2.0 * jnp.pi * pos * freqs / scale  # (n, F)
    enc = jnp.stack([jnp.sin(angle), jnp.cos(angle)], axis=-1)  # (n, F, 2)
    return enc.reshape(n, 2 * len(POS_FREQS)).astype(dtype)


def _median_from_sorted(sorted_vals: jnp.ndarray) -> jnp.ndarray:
    """Median along the last axis given pre-sorted values."""
    m = sorted_vals.shape[-1]
    mid = m // 2
    if m % 2 == 1:
        return sorted_vals[..., mid]
    return 0.5 * (sorted_vals[..., mid - 1] + sorted_vals[..., mid])


def _kth_of_merged(A: jnp.ndarray, B: jnp.ndarray, k: int) -> jnp.ndarray:
    """Rank-k (0-indexed) element of merge(A, B) along the last axis.

    A (..., p) and B (..., q) are each sorted ascending.  Classic two-sorted-
    arrays selection: bisect over i = how many elements of the merged prefix
    come from A; a split is valid iff A[i-1] <= B[k-i] and B[k-i-1] <= A[i]
    (sentinels at the ends).  Exact — no value-space bisection — in
    ceil(log2) gather rounds, each a cheap per-row take_along_axis.
    """
    p, q = A.shape[-1], B.shape[-1]
    neg = jnp.asarray(-jnp.inf, A.dtype)
    pos = jnp.asarray(jnp.inf, A.dtype)
    Ap = jnp.concatenate(
        [jnp.full(A.shape[:-1] + (1,), neg), A, jnp.full(A.shape[:-1] + (1,), pos)],
        axis=-1,
    )  # Ap[i] == A[i-1] with sentinels
    Bp = jnp.concatenate(
        [jnp.full(B.shape[:-1] + (1,), neg), B, jnp.full(B.shape[:-1] + (1,), pos)],
        axis=-1,
    )

    lo0 = max(0, k + 1 - q)
    hi0 = min(k + 1, p)
    lo = jnp.full(A.shape[:-1], lo0, jnp.int32)
    hi = jnp.full(A.shape[:-1], hi0, jnp.int32)

    def take(X, idx):
        return jnp.take_along_axis(X, idx[..., None], axis=-1)[..., 0]

    steps = max(1, int(np.ceil(np.log2(max(2, hi0 - lo0 + 1)))) + 1)
    for _ in range(steps):
        i = (lo + hi) // 2  # take i elements from A
        j = k + 1 - i       # and j from B
        # Need A[i-1] <= B[j] (i.e. Ap[i] <= Bp[j+1]); otherwise shrink hi.
        a_last = take(Ap, i)        # A[i-1]
        b_next = take(Bp, j + 1)    # B[j]
        need_less_from_A = a_last > b_next
        hi = jnp.where(need_less_from_A, i - 1, hi)
        # Need B[j-1] <= A[i] (Bp[j] <= Ap[i+1]); otherwise grow lo.
        b_last = take(Bp, j)        # B[j-1]
        a_next = take(Ap, i + 1)    # A[i]
        need_more_from_A = b_last > a_next
        lo = jnp.where(need_less_from_A, lo, jnp.where(need_more_from_A, i + 1, i))
        hi = jnp.where(need_less_from_A, hi, jnp.where(need_more_from_A, hi, i))

    i = lo
    j = k + 1 - i
    return jnp.maximum(take(Ap, i), take(Bp, j))


def _mad_from_sorted(sorted_vals: jnp.ndarray, med: jnp.ndarray) -> jnp.ndarray:
    """Median absolute deviation given the pre-sorted values and their median.

    The sorted |x - med| sequence is the merge of two already-sorted halves:
    (med - below-half reversed) and (above-half - med) — so the second full
    row sort the naive formulation pays (the single most expensive op in the
    21-D feature pass at large n) collapses to an O(log n) exact selection
    (`_kth_of_merged`).
    """
    m = sorted_vals.shape[-1]
    mid = m // 2
    A = med[..., None] - sorted_vals[..., :mid][..., ::-1]  # ascending deviations
    B = sorted_vals[..., mid:] - med[..., None]             # ascending deviations
    if m % 2 == 1:
        return _kth_of_merged(A, B, mid)
    lo_v = _kth_of_merged(A, B, mid - 1)
    hi_v = _kth_of_merged(A, B, mid)
    return 0.5 * (lo_v + hi_v)


def _entropy(C: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Stabilised softmax entropy of exp(-C) along ``axis``
    (features.py:179-182: shift by the min before exponentiating)."""
    Z = jnp.min(C, axis=axis, keepdims=True)
    e = jnp.exp(-(C - Z))
    p = e / (jnp.sum(e, axis=axis, keepdims=True) + EPS)
    return -jnp.sum(p * jnp.log(p + EPS), axis=axis)


def row_features(C: jnp.ndarray) -> jnp.ndarray:
    """21-D per-row statistics for OneGNN (features.py:161-243).

    Channels, in order: row min, max, mean, std (population), MAD, entropy,
    second-best gap, competition, k=10-smallest mean/std, difficulty,
    near-best density, is-col-best fraction, then 8-D positional encodings.

    Accepts (n, n) or (B, n, n); returns (..., n, 21) float32.
    """
    squeeze = C.ndim == 2
    if squeeze:
        C = C[None]
    B, n, m = C.shape
    Cf = C.astype(jnp.float32)

    row_min = jnp.min(Cf, axis=-1)
    row_max = jnp.max(Cf, axis=-1)
    row_mean = jnp.mean(Cf, axis=-1)
    row_std = jnp.std(Cf, axis=-1)

    sorted_C = jnp.sort(Cf, axis=-1)
    row_med = _median_from_sorted(sorted_C)
    # MAD via exact merged-halves selection — avoids a second full row sort.
    row_mad = _mad_from_sorted(sorted_C, row_med)
    row_mad = jnp.maximum(row_mad, EPS)

    row_entropy = _entropy(Cf, axis=-1)

    if m >= 2:
        second_best_gap = sorted_C[..., 1] - sorted_C[..., 0]
        span = sorted_C[..., -1] - sorted_C[..., 0]
        competition = second_best_gap / (span + EPS)
    else:
        second_best_gap = jnp.zeros((B, n), jnp.float32)
        competition = jnp.zeros((B, n), jnp.float32)

    k = min(10, m)
    k_small = sorted_C[..., :k]
    k_mean = jnp.mean(k_small, axis=-1)
    k_std = jnp.std(k_small, axis=-1)

    if m >= 2:
        diffs = sorted_C[..., 1:] - sorted_C[..., :-1]
        difficulty = 1.0 / (jnp.mean(diffs, axis=-1) + EPS)
    else:
        difficulty = jnp.zeros((B, n), jnp.float32)

    near_best = jnp.mean((Cf <= row_min[..., None] * 1.1).astype(jnp.float32), axis=-1)

    col_min = jnp.min(Cf, axis=-2)
    is_col_best = jnp.sum((Cf == col_min[..., None, :]).astype(jnp.float32), axis=-1) / m

    pos = jnp.broadcast_to(positional_encodings(n), (B, n, 2 * len(POS_FREQS)))

    feat = jnp.concatenate(
        [
            jnp.stack(
                [
                    row_min,
                    row_max,
                    row_mean,
                    row_std,
                    row_mad,
                    row_entropy,
                    second_best_gap,
                    competition,
                    k_mean,
                    k_std,
                    difficulty,
                    near_best,
                    is_col_best,
                ],
                axis=-1,
            ),
            pos,
        ],
        axis=-1,
    )
    return feat[0] if squeeze else feat


def fast_row_features(C: jnp.ndarray, _force_pallas: bool = False) -> jnp.ndarray:
    """``row_features`` routed through the fused sort-free Pallas kernel
    (ops/pallas/features.py: bitwise radix bisection instead of the full row
    sort) on a TPU backend with f32 input and n >= 1024 (n % 8 == 0).
    Identical semantics (parity pinned to ~1e-6 rel across all families in
    tests/test_pallas.py).  Default ON since the on-device measurement
    (bench_results/north_star_tpu_r2.json, TPU v5e): 6.65 vs 2.80 GB/s at
    n=2048 and 12.39 vs 3.29 GB/s at n=8192 — a 2.4-3.8x win over the
    XLA sort path.  Opt out with ``LAPGNN_PALLAS_FEATURES=0``.

    The env var is read at TRACE time: set it before the process (or at
    least before the pipeline's first predict) — flipping it after a jitted
    caller has traced has no effect on the cached executable.

    ``_force_pallas`` (tests only) takes the kernel branch in interpret mode
    off-TPU so the batching/concat glue is exercised by the CPU suite.
    """
    import os

    n = C.shape[-1]
    if not _force_pallas and (
        os.environ.get("LAPGNN_PALLAS_FEATURES", "1") == "0"
        or C.dtype != jnp.float32
        or C.shape[-2] != n
        or n < 1024
        or n % 8 != 0
        or jax.default_backend() != "tpu"
    ):
        return row_features(C)
    from .pallas.features import pallas_row_features_stats

    interp = jax.default_backend() != "tpu"
    squeeze = C.ndim == 2
    Cb = C[None] if squeeze else C
    batch_shape = Cb.shape[:-2]
    flat = Cb.reshape((-1,) + Cb.shape[-2:])
    stats = jax.vmap(lambda x: pallas_row_features_stats(x, interpret=interp))(flat)
    stats = stats.reshape(batch_shape + stats.shape[-2:])
    pos = jnp.broadcast_to(
        positional_encodings(n), batch_shape + (n, 2 * len(POS_FREQS))
    )
    feat = jnp.concatenate([stats, pos], axis=-1)
    return feat[0] if squeeze else feat


class GraphFeatures(NamedTuple):
    row_feat: jnp.ndarray   # (..., n, 14)
    col_feat: jnp.ndarray   # (..., n, 14)
    edge_feat: jnp.ndarray  # (..., n, n, 10)


def _normalized_ranks(C: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Rank of each entry along ``axis``, normalised to [0, 1]
    (features.py:34-39: double argsort).

    The inverse permutation of argsort is computed with a SECOND argsort
    (identical result — argsort output is always a permutation) rather than
    put_along_axis: the scatter that put_along_axis lowers to cannot be
    partitioned by GSPMD, which would fully replicate the matrix and its
    int32 index tuples on every device of a sharded mesh (parallel/dual.py).
    Sorts along an unsharded axis stay shard-local."""
    n = C.shape[axis]
    if n <= 1:
        return jnp.zeros_like(C, dtype=jnp.float32)
    order = jnp.argsort(C, axis=axis)
    ranks = jnp.argsort(order, axis=axis).astype(jnp.float32)
    return ranks / (n - 1)


def _axis_stats(C: jnp.ndarray, axis: int):
    mn = jnp.min(C, axis=axis)
    mx = jnp.max(C, axis=axis)
    mean = jnp.mean(C, axis=axis)
    std = jnp.std(C, axis=axis)
    sorted_vals = jnp.sort(jnp.moveaxis(C, axis, -1), axis=-1)
    med = _median_from_sorted(sorted_vals)
    # MAD via merged-halves selection from the SAME sort — the second full
    # sort was the most expensive op of the DualGNN feature pass (same
    # optimization row_features already applies).
    mad = jnp.maximum(_mad_from_sorted(sorted_vals, med), EPS)
    ent = _entropy(C, axis=axis)
    return mn, mx, mean, std, med, mad, ent


def graph_features(
    C: jnp.ndarray,
    include_reduced_cost: bool = False,
    u: Optional[jnp.ndarray] = None,
    constrain_rows=None,
    constrain_cols=None,
) -> GraphFeatures:
    """Dense bipartite graph features for DualGNN (features.py:49-153).

    Node features (14-D, rows and columns symmetric): min, max, mean, std,
    MAD, entropy + 8-D positional encodings.  Edge features (10 channels):
    scaled cost, row rank, col rank, row gap, col gap, row/col tie fractions,
    row/col entropies (broadcast), and the reduced cost channel (zeros unless
    ``include_reduced_cost`` with a ``u`` seed, in which case v comes from the
    min-trick as in features.py:112-116).

    Note: the reference computes the DualGNN entropy channel *without* the
    min-shift stabilisation used for OneGNN (features.py:66-68); we keep the
    stabilised form everywhere since exp(-C+min) differs from exp(-C) only by
    a factor that cancels in the softmax.
    """
    squeeze = C.ndim == 2
    if squeeze:
        C = C[None]
    B, n, _ = C.shape
    Cf = C.astype(jnp.float32)

    # Distribution hooks (parallel/dual.py): the sort-based row/col channels
    # need whole rows / whole columns, so under a 2-D (row, col) edge mesh
    # they must run on a one-axis-sharded copy of C — ``constrain_rows`` /
    # ``constrain_cols`` pin those layouts (with_sharding_constraint) so
    # GSPMD reshards C once per axis instead of fully replicating it and
    # redoing every sort on every device.  Identity on a single device.
    Cr = constrain_rows(Cf) if constrain_rows is not None else Cf
    Cc = constrain_cols(Cf) if constrain_cols is not None else Cf

    r_mn, r_mx, r_mean, r_std, r_med, r_mad, r_ent = _axis_stats(Cr, axis=-1)
    c_mn, c_mx, c_mean, c_std, c_med, c_mad, c_ent = _axis_stats(Cc, axis=-2)

    scaled_cost = (Cf - r_med[..., :, None]) / r_mad[..., :, None]
    row_rank = _normalized_ranks(Cr, axis=-1)
    col_rank = _normalized_ranks(Cc, axis=-2)
    row_gap = Cf - r_mn[..., :, None]
    col_gap = Cf - c_mn[..., None, :]
    row_tie = jnp.sum((row_gap <= TAU).astype(jnp.float32), axis=-1) / max(1, n)
    col_tie = jnp.sum((col_gap <= TAU).astype(jnp.float32), axis=-2) / max(1, n)

    if include_reduced_cost and u is not None:
        uf = u.astype(jnp.float32)
        if uf.ndim == 1:
            uf = uf[None]
        v = jnp.min(Cf - uf[..., :, None], axis=-2)
        reduced = Cf - uf[..., :, None] - v[..., None, :]
    else:
        reduced = jnp.zeros_like(Cf)

    ones_row = jnp.ones((1, 1, n), jnp.float32)
    edge_feat = jnp.stack(
        [
            scaled_cost,
            row_rank,
            col_rank,
            row_gap,
            col_gap,
            row_tie[..., :, None] * ones_row,
            col_tie[..., None, :] * jnp.ones((1, n, 1), jnp.float32),
            r_ent[..., :, None] * ones_row,
            c_ent[..., None, :] * jnp.ones((1, n, 1), jnp.float32),
            reduced,
        ],
        axis=-1,
    )

    pos = jnp.broadcast_to(positional_encodings(n), (B, n, 2 * len(POS_FREQS)))
    row_feat = jnp.concatenate(
        [jnp.stack([r_mn, r_mx, r_mean, r_std, r_mad, r_ent], axis=-1), pos], axis=-1
    )
    col_feat = jnp.concatenate(
        [jnp.stack([c_mn, c_mx, c_mean, c_std, c_mad, c_ent], axis=-1), pos], axis=-1
    )

    if squeeze:
        return GraphFeatures(row_feat[0], col_feat[0], edge_feat[0])
    return GraphFeatures(row_feat, col_feat, edge_feat)
