"""Pallas kernel: fused single-pass row statistics.

Computes the non-sort subset of the 21-D OneGNN row features — min, max,
mean, std (population), stabilised softmax entropy, near-best density — in
one streaming pass over the cost matrix.  The reference computes each of
these as a separate full-matrix NumPy/torch op (gnn/features.py:161-243);
here each row tile is read from HBM once and all six statistics come out of
VMEM registers.

Entropy note: with Z = row min,  p_j = e_j / S,  e_j = exp(-(C_ij - Z)),
S = sum e_j, the entropy  -sum p log p  equals  log S + (1/S) sum e_j (C_ij
- Z),  so it needs only the three accumulators (S, sum e*(C-Z), min) — no
second pass, matching the reference's EPS placement only approximately (the
reference adds EPS inside the log; the difference is O(EPS) and covered by
test tolerances).

Grid: 1-D over row tiles, n columns resident per tile.

NOTE: superseded for production by ops/pallas/features.py, which computes
these six channels AND the sort-dependent ones (exact selection via radix
bisection) in the same single read of C, with two-pass std and literal-EPS
entropy.  This kernel remains as the minimal streaming-stats exemplar and
for its interpret-mode tests; new routing work should target features.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_row_stats"]

EPS = 1e-9
_ROW_TILE = 256

# Output channel order.
CHANNELS = ("min", "max", "mean", "std", "entropy", "near_best")


def _rowstats_kernel(c_ref, out_ref):
    C = c_ref[:]  # (tile, m)
    m = C.shape[-1]
    inv_m = 1.0 / m

    r_min = jnp.min(C, axis=1)
    r_max = jnp.max(C, axis=1)
    s1 = jnp.sum(C, axis=1)
    s2 = jnp.sum(C * C, axis=1)
    mean = s1 * inv_m
    var = jnp.maximum(s2 * inv_m - mean * mean, 0.0)
    std = jnp.sqrt(var)

    shifted = C - r_min[:, None]
    e = jnp.exp(-shifted)
    S = jnp.sum(e, axis=1) + EPS
    weighted = jnp.sum(e * shifted, axis=1)
    entropy = jnp.log(S) + weighted / S

    near = jnp.sum((C <= r_min[:, None] * 1.1).astype(C.dtype), axis=1) * inv_m

    # Channels-first layout: rows ride the 128-wide lane dimension.
    out_ref[:] = jnp.stack([r_min, r_max, mean, std, entropy, near], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_row_stats(C: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(n, m) -> (n, 6): min, max, mean, std, entropy, near-best density."""
    n, m = C.shape
    from .colmin import _row_tile

    tile = _row_tile(n, m, C.dtype.itemsize)
    out = pl.pallas_call(
        _rowstats_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (len(CHANNELS), tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((len(CHANNELS), n), C.dtype),
        interpret=interpret,
    )(C)
    return out.T
