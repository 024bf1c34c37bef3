"""Pallas kernels: tiled column-min and fused min-trick.

The min-trick v_j = min_i (C_ij - u_i) is the pipeline's signature reduction
(README.md:11-18 of the reference; executed on every predict and inside the
seeded solver).  At n = 16K the cost matrix is 1 GB in f32 — strictly
HBM-bandwidth bound.  These kernels stream row-tiles through VMEM once,
accumulating the running column minimum in a VMEM scratch accumulator, so C
is read exactly once with no intermediate (C - u) materialisation (XLA fuses
this too on simple cases; the kernel pins the behaviour and is the substrate
for multi-chip ring overlap later).

Grid: 1-D over row tiles; the (n,)-column accumulator lives in VMEM scratch
and is flushed to the output on the last tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_col_min", "pallas_min_trick"]

_ROW_TILE = 256
# Per-block VMEM budget for the streamed C tile (double buffering means the
# compiler holds ~2 of these; stay well under the 16 MB/core VMEM).
_TILE_BYTES = 4 * 1024 * 1024


def _colmin_kernel(c_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, jnp.inf)

    tile_min = jnp.min(c_ref[:], axis=0, keepdims=True)  # (1, n)
    acc_ref[:] = jnp.minimum(acc_ref[:], tile_min)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        out_ref[:] = acc_ref[:]


def _mintrick_kernel(c_ref, u_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, jnp.inf)

    shifted = c_ref[:] - u_ref[:]  # (tile, n) - (tile, 1)
    tile_min = jnp.min(shifted, axis=0, keepdims=True)
    acc_ref[:] = jnp.minimum(acc_ref[:], tile_min)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        out_ref[:] = acc_ref[:]


def _row_tile(n: int, m: int, itemsize: int = 4) -> int:
    """Largest row tile <= _ROW_TILE dividing n whose (tile, m) block fits the
    VMEM budget."""
    cap = max(8, _TILE_BYTES // max(1, m * itemsize))
    tile = min(_ROW_TILE, cap, n)
    while tile > 1 and n % tile != 0:
        tile -= 1
    return max(tile, 1)  # tile=1 divides any n; no whole-matrix fallback


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_col_min(C: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(n, m) -> (m,) column minimum, one streaming pass over C."""
    n, m = C.shape
    tile = _row_tile(n, m, C.dtype.itemsize)
    out = pl.pallas_call(
        _colmin_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), C.dtype),
        scratch_shapes=[pltpu.VMEM((1, m), C.dtype)],
        interpret=interpret,
    )(C)
    return out[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_min_trick(
    C: jnp.ndarray, u: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(n, m), (n,) -> (m,) fused v_j = min_i (C_ij - u_i)."""
    n, m = C.shape
    tile = _row_tile(n, m, C.dtype.itemsize)
    out = pl.pallas_call(
        _mintrick_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # u travels as a (n, 1) column so the block layout matches the
            # TPU lane tiling (1-D operands trip XLA/Mosaic layout checks).
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), C.dtype),
        scratch_shapes=[pltpu.VMEM((1, m), C.dtype)],
        interpret=interpret,
    )(C, u.reshape(n, 1))
    return out[0]
