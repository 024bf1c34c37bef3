"""Pallas kernel: fully-fused 21-D row-feature pass, sort-free.

The 21-D OneGNN feature pass (ops/features.py, reference gnn/features.py:
161-243) is the dominant predict-side cost, and its single most expensive op
is the full per-row ``jnp.sort`` that feeds median / MAD / second-best /
k-smallest.  A sort computes far more than those channels need: they are
*selection* problems.  This kernel replaces the O(n log² n)-stage sorting
network with **bitwise radix bisection** on the order-isomorphic uint32
image of f32 (sign-flip trick): 32 counting passes over the row tile held in
VMEM recover the exact k-th order statistic — exact selection, no sort, and
the cost matrix is read from HBM exactly once for the *entire* 13-channel
statistics block (the XLA path reads it several times: sort in + sorted out
+ stats passes).

Per row tile the kernel computes, matching ops/features.row_features
bit-for-tolerance:
  min, max, mean, std, MAD, entropy, second-best gap, competition,
  k=10-smallest mean/std, difficulty, near-best density, is-col-best
(positional encodings are appended outside — they do not touch C).

Selection identities used (exactness):
  * median (even m): lo = rank-m/2, hi = next distinct key or lo on ties —
    one bisection + one masked-min pass instead of two bisections.
  * MAD: median of |x − med| — deviations are recomputed in registers per
    pass, no second buffer; float negation is exact so |x − med| equals the
    reference's merged-halves deviations exactly.
  * k-smallest sum/sumsq: threshold T = rank-k value, then
    Σ_{x<T} x + (k − #{x<T})·T — tie-exact.

Status: production default — ops.features.fast_row_features routes through
this kernel on TPU (f32, n >= 1024, n % 8 == 0) since the on-device
measurement showed a 2.4-3.8x win over the XLA sort path at n=2048/8192
(bench_results/north_star_tpu_r2.json, TPU v5e).  Opt out with
``LAPGNN_PALLAS_FEATURES=0``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_row_features_stats", "STAT_CHANNELS"]

EPS = 1e-9

STAT_CHANNELS = (
    "min", "max", "mean", "std", "mad", "entropy", "second_best_gap",
    "competition", "k_mean", "k_std", "difficulty", "near_best",
    "is_col_best",
)

_SIGN = np.uint32(0x80000000)
_FULL = np.uint32(0xFFFFFFFF)


def _to_key(x):
    """Order-isomorphic f32 -> uint32: negatives bit-inverted, positives
    sign-flipped.  Monotone for all finite values."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(u & _SIGN != 0, _FULL - u, u | _SIGN)


def _from_key(k):
    u = jnp.where(k & _SIGN != 0, k ^ _SIGN, _FULL - k)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _umin(x_u32, axis):
    """Min-reduce uint32 values on Mosaic, which has no unsigned reductions
    (NotImplementedError on real TPU; interpret mode accepts them, which is
    how this slipped past the CPU tests).  XOR of the sign bit is an order
    isomorphism uint32 -> int32, so reduce the signed image and map back."""
    signed = jax.lax.bitcast_convert_type(x_u32 ^ _SIGN, jnp.int32)
    m = jnp.min(signed, axis=axis)
    return jax.lax.bitcast_convert_type(m, jnp.uint32) ^ _SIGN


def _kth_key(keys, k: int):
    """Exact rank-k (1-indexed) smallest key per row via 32-step bitwise
    bisection.  keys: (R, m) uint32 -> (R,) uint32.

    Invariant: prefix <= answer < prefix + 2^(bit+1).  Each step costs one
    broadcast compare + row-sum over the VMEM-resident tile.
    """
    R = keys.shape[0]
    prefix = jnp.zeros((R, 1), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = prefix | np.uint32(1 << bit)
        cnt = jnp.sum((keys < cand).astype(jnp.int32), axis=1, keepdims=True)
        prefix = jnp.where(cnt >= k, prefix, cand)
    return prefix[:, 0]


def _next_distinct_or_same(keys, kth_key, rank: int):
    """Rank+1-th smallest given the rank-th key: the rank-th key itself when
    it has multiplicity past ``rank``, else the smallest strictly larger
    key.  One counting pass + one masked-min pass."""
    kk = kth_key[:, None]
    le = jnp.sum((keys <= kk).astype(jnp.int32), axis=1)
    bigger = _umin(jnp.where(keys > kk, keys, _FULL), axis=1)
    return jnp.where(le >= rank + 1, kth_key, bigger)


def _median_from_keys(keys, m: int):
    """Median matching ops.features._median_from_sorted exactly."""
    mid = m // 2
    if m % 2 == 1:
        return _from_key(_kth_key(keys, mid + 1))
    lo_key = _kth_key(keys, mid)
    hi_key = _next_distinct_or_same(keys, lo_key, mid)
    return 0.5 * (_from_key(lo_key) + _from_key(hi_key))


def _feature_kernel(c_ref, colmin_ref, out_ref, *, m: int, k: int):
    C = c_ref[:]  # (R, m) f32
    inv_m = 1.0 / m

    r_min = jnp.min(C, axis=1)
    r_max = jnp.max(C, axis=1)
    mean = jnp.sum(C, axis=1) * inv_m
    # two-pass variance: the sumsq - mean² form cancels catastrophically on
    # low-variance rows (noisy_linear), and jnp.std is two-pass
    dm = C - mean[:, None]
    std = jnp.sqrt(jnp.maximum(jnp.sum(dm * dm, axis=1) * inv_m, 0.0))

    # entropy exactly as ops.features._entropy: p = e/(Σe + EPS),
    # H = -Σ p·log(p + EPS) — the EPS sits *inside* the log, so the
    # log-sum-exp identity is off by O(EPS/p) on near-deterministic rows
    # (metric family); compute the literal form instead.
    e = jnp.exp(-(C - r_min[:, None]))
    p = e / (jnp.sum(e, axis=1, keepdims=True) + EPS)
    entropy = -jnp.sum(p * jnp.log(p + EPS), axis=1)

    near = jnp.sum((C <= r_min[:, None] * 1.1).astype(C.dtype), axis=1) * inv_m

    # second smallest with multiplicity: min again if the min repeats.
    min_cnt = jnp.sum((C == r_min[:, None]).astype(jnp.int32), axis=1)
    above = jnp.min(jnp.where(C > r_min[:, None], C, jnp.inf), axis=1)
    second = jnp.where(min_cnt > 1, r_min, above)
    gap = second - r_min
    span = r_max - r_min
    competition = gap / (span + EPS)

    # mean consecutive sorted diff telescopes to span / (m - 1).
    difficulty = 1.0 / (span / max(m - 1, 1) + EPS) if m >= 2 else jnp.zeros_like(r_min)

    keys = _to_key(C)
    med = _median_from_keys(keys, m)

    dev = jnp.abs(C - med[:, None])
    dkeys = _to_key(dev)
    mad = jnp.maximum(_median_from_keys(dkeys, m), EPS)

    # k-smallest mean/std, tie-exact via the rank-k threshold.
    t_key = _kth_key(keys, k)
    T = _from_key(t_key)
    below = keys < t_key[:, None]
    c_lt = jnp.sum(below.astype(jnp.int32), axis=1)
    take = (k - c_lt).astype(C.dtype)
    ks1 = jnp.sum(jnp.where(below, C, 0.0), axis=1) + take * T
    k_mean = ks1 / k
    # two-pass variance (sumsq - mean² cancels catastrophically when the k
    # smallest cluster tightly, e.g. noisy_linear rows)
    d = C - k_mean[:, None]
    ksd = jnp.sum(jnp.where(below, d * d, 0.0), axis=1)
    dT = T - k_mean
    k_std = jnp.sqrt(jnp.maximum((ksd + take * dT * dT) / k, 0.0))

    is_col_best = (
        jnp.sum((C == colmin_ref[:]).astype(C.dtype), axis=1) * inv_m
    )

    if m < 2:
        gap = jnp.zeros_like(r_min)
        competition = jnp.zeros_like(r_min)

    # (tile, 13) layout: the block's last dim equals the full output dim, so
    # lowering is legal for ANY row tile (a (13, tile) block needs tile to be
    # a multiple of 128 — the VMEM budget drops the tile to 32 at n=8192).
    out_ref[:] = jnp.stack(
        [r_min, r_max, mean, std, mad, entropy, gap, competition,
         k_mean, k_std, difficulty, near, is_col_best],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_row_features_stats(
    C: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(n, m) f32 -> (n, 13) statistics block of the 21-D feature pass.

    Channel order matches ops.features.row_features channels 0..12; append
    positional encodings outside for the full 21-D tensor.
    """
    n, m = C.shape
    from .colmin import _row_tile, pallas_col_min

    col_min = pallas_col_min(C, interpret=interpret)[None]  # (1, m)
    # keys + deviations double the live tile; budget via a fatter itemsize.
    tile = _row_tile(n, m, C.dtype.itemsize * 3)
    # Sublane alignment: a (tile, m) input block with tile < n must have
    # tile % 8 == 0.  _row_tile only guarantees tile | n, so take the largest
    # 8-aligned divisor of n not above the VMEM-budget tile.
    if tile < n and tile % 8 != 0:
        aligned = [t for t in range(8, tile + 1, 8) if n % t == 0]
        if not aligned:
            raise ValueError(
                f"pallas_row_features_stats needs n divisible by 8 when the "
                f"VMEM budget forces row tiling (n={n}, m={m}); route through "
                f"ops.features.row_features instead"
            )
        tile = aligned[-1]
    k = min(10, m)
    out = pl.pallas_call(
        functools.partial(_feature_kernel, m=m, k=k),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, len(STAT_CHANNELS)), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, len(STAT_CHANNELS)), C.dtype),
        interpret=interpret,
    )(C, col_min)
    return out
