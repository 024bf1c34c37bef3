"""Device mesh construction and sharding helpers.

The reference has no distributed layer (SURVEY.md §2.7); this module is the
from-scratch TPU-native one.  Axis conventions:

  "data"  - batch data parallelism (instances)
  "model" - intra-instance partitioning: ROWS of the cost matrix
            (the "sequence" axis of this workload — n can reach 16K+;
            every production consumer shards rows: sharded.py P("data",
            "model", None), solver.py P("model", None))
  "row"/"col" - optional 2-D tiling of a single giant instance

Built on ``jax.sharding.Mesh`` + ``NamedSharding``; collectives ride ICI when
the mesh maps onto a pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "P", "Mesh", "NamedSharding"]


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data x model) mesh.  ``data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, *, shard_n: bool = False) -> NamedSharding:
    """Sharding for a (B, n, n) cost batch: B over 'data', optionally the
    ROW axis over 'model' — matching the convention of every production
    consumer (a column-axis placement here would force GSPMD to all-to-all
    the whole O(n^2) batch before the row-sharded predict/solve)."""
    if shard_n:
        return NamedSharding(mesh, P("data", "model", None))
    return NamedSharding(mesh, P("data", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
