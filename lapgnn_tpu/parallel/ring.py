"""Explicit ring collectives over a mesh axis (shard_map + ppermute).

``lax.pmin`` lets XLA pick the all-reduce schedule; this module pins a
bidirectional-capable ring schedule explicitly — the substrate for
overlapping boundary exchanges with compute when the pipeline spans a pod
slice (SURVEY.md §5's "boundary all-to-all over ICI overlapped with
aggregation").  On hardware the per-hop transfer rides ICI neighbour links;
on the virtual CPU mesh it validates the schedule's correctness.

``ring_all_reduce_min(x, axis)``: after k = axis_size - 1 hops every shard
holds the elementwise minimum across shards.  Each hop sends the current
partial to the next neighbour (ppermute) and folds it in — bandwidth-optimal
for reductions whose payload is the full vector (the column-min exchange of
the row-sharded LAP pipeline is exactly this shape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_all_reduce_min", "ring_min_trick"]


def _ring_min_body(x, axis: str):
    size = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    perm = [(i, (i + 1) % size) for i in range(size)]

    def step(carry, _):
        partial, acc = carry
        received = lax.ppermute(partial, axis, perm)
        return (received, jnp.minimum(acc, received)), None

    (_, acc), _ = lax.scan(step, (x, x), None, length=size - 1)
    return acc


def ring_all_reduce_min(mesh: Mesh, axis: str = "model"):
    """Build f(partials) -> replicated elementwise min across ``axis``.

    ``partials`` has the per-shard partials stacked on the LEADING dimension
    (shape (mesh[axis], ...)); that dimension is partitioned over ``axis``
    so each device contributes ITS partial to the ring.  (The previous
    in_specs=(P(),) replicated the whole stack to every device, making the
    ring an expensive identity — every device ring-combined size-1 copies
    of the same global array.)
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(),
        check_vma=False,
    )
    def _reduce(x):
        # each shard's block is (1, ...) — its own partial
        return _ring_min_body(x[0], axis)

    return _reduce


def ring_min_trick(mesh: Mesh, axis: str = "model"):
    """Row-sharded min-trick with an explicit ring combine.

    (n, m) C sharded over rows, (n,) u sharded likewise -> (m,) v replicated:
    local column-min of (C - u) per shard, then ring all-reduce-min — the
    two-phase local-reduce -> cross-shard-combine structure from the build
    plan (SURVEY.md §7 hard parts).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def _mt(C_blk, u_blk):
        local = jnp.min(C_blk - u_blk[:, None], axis=0)
        return _ring_min_body(local, axis)

    return _mt
