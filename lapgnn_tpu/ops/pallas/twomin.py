"""Pallas kernel: fused per-row two-minimum of the reduced cost matrix.

The inner operation of augmenting row reduction / auction bidding
(reference lapjv.cpp:100-114, lapjv_seeded.cpp:142-151; here
solver/seeded.jacobi_arr): for each row of red = C - v, find the smallest
value, its column, and the second-smallest value.  The jnp formulation costs
three passes over C per round (argmin, gather, masked re-min); this kernel
streams each row tile once and emits all three outputs.

Outputs channels-first (3, n): [min1, min2, argmin1-as-float] — rows ride
the 128-lane axis.  argmin is exact for n < 2^24 (float32 integer range).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .colmin import _row_tile

__all__ = ["pallas_two_min"]


def _twomin_kernel(c_ref, v_ref, out_ref):
    red = c_ref[:] - v_ref[:]  # (tile, n)
    tile, n = red.shape
    min1 = jnp.min(red, axis=1)
    j1 = jnp.argmin(red, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    excl = jnp.where(cols == j1[:, None], jnp.inf, red)
    min2 = jnp.min(excl, axis=1)
    out_ref[:] = jnp.stack([min1, min2, j1.astype(red.dtype)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_two_min(C: jnp.ndarray, v: jnp.ndarray, interpret: bool = False):
    """(n, m), (m,) -> (min1 (n,), min2 (n,), argmin1 (n,) int32) of C - v."""
    n, m = C.shape
    if C.dtype != jnp.float32:
        # argmin indices round-trip through the value dtype inside the
        # kernel; sub-f32 dtypes (bf16) corrupt indices above 256.
        raise TypeError(f"pallas_two_min requires float32, got {C.dtype}")
    # Working set is ~4x the streamed block (red + iota cols + excl
    # temporaries alongside C), unlike colmin's single-block budget.
    tile = _row_tile(n, m, C.dtype.itemsize * 4)
    out = pl.pallas_call(
        _twomin_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, n), C.dtype),
        interpret=interpret,
    )(C, v.reshape(1, m))
    return out[0], out[1], out[2].astype(jnp.int32)
