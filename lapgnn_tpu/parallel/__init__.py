"""Distribution layer: device meshes, shardings, collective ops."""

from .mesh import Mesh, NamedSharding, P, batch_sharding, make_mesh, replicated
from .sharded import (
    make_dp_train_step,
    make_sharded_predict,
    shmap_col_min,
    shmap_min_trick,
)

__all__ = [
    "Mesh",
    "NamedSharding",
    "P",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "make_dp_train_step",
    "make_sharded_predict",
    "shmap_col_min",
    "shmap_min_trick",
]
