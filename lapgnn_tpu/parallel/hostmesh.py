"""Multi-host (DCN x ICI) mesh construction and host-local data feeding.

The reference is single-process (SURVEY.md §2.7: no torch.distributed, no
NCCL/MPI, no launcher) — this module is the from-scratch multi-host layer of
the TPU framework.  It encodes one placement rule and provides the two
mechanics a multi-host run needs:

**Placement rule.**  The "model" axis partitions the rows of a single cost
matrix; every production consumer (parallel/sharded.py, parallel/solver.py,
parallel/dual.py) exchanges O(n)-vector collectives over it *per solver
sweep / per GNN layer* — latency-critical traffic that must ride **ICI**
(the intra-slice interconnect).  The "data" axis carries batch data
parallelism: its only collective is the O(params) gradient all-reduce, once
per step — bandwidth-light, latency-tolerant, safe to place on **DCN**
(the between-host data-center network).  ``make_hierarchical_mesh``
therefore lays out meshes as ``data = hosts x per-host-spare`` and
constrains ``model`` to live inside one host's ICI domain, refusing layouts
where the row-partition axis would straddle DCN.

**Mechanics.**
  * ``initialize_distributed()`` — the multi-process entry point
    (``jax.distributed.initialize``), env-gated so single-process runs are
    untouched.
  * ``global_batch_from_host_local`` — assemble a global sharded batch from
    each process's host-local shard (``jax.make_array_from_process_local_data``),
    the JAX-native replacement for a distributed DataLoader.

On a single process the mesh degenerates to the contiguous layout of
``make_mesh`` (virtual CPU meshes, the dev chip) — the hierarchical
constraints are still validated via ``devices_per_host``, which is how the
tests exercise the DCN-aware logic without multi-host hardware.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_hierarchical_mesh",
    "global_batch_from_host_local",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX multi-process mode; returns True if initialized.

    No-op (returns False) unless a coordinator is specified — either via
    arguments or the standard env vars (``JAX_COORDINATOR_ADDRESS`` +
    ``JAX_NUM_PROCESSES`` + ``JAX_PROCESS_ID``, or a TPU pod environment
    where ``jax.distributed.initialize()`` autodetects everything).  Call
    BEFORE any other JAX API, once per process; after it, ``jax.devices()``
    is global and the meshes built here span all hosts.
    """
    # `or None`: a set-but-empty env var (launcher templates export
    # JAX_COORDINATOR_ADDRESS="") must mean "unset", not "configured".
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS") or None
    autodetect = os.environ.get("TPU_WORKER_HOSTNAMES") is not None
    if addr is None and not autodetect:
        return False
    # Already-initialized check must NOT touch the backend:
    # jax.process_count() would initialise XLA, after which
    # jax.distributed.initialize() hard-errors.
    if jax.distributed.is_initialized():
        return True
    kwargs = {}
    if addr is not None:
        kwargs["coordinator_address"] = addr
        np_ = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
        pid = process_id if process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", "-1")
        )
        if np_ <= 0 or pid < 0:
            raise ValueError(
                "coordinator_address given but num_processes/process_id "
                "missing (set JAX_NUM_PROCESSES and JAX_PROCESS_ID)"
            )
        kwargs["num_processes"] = np_
        kwargs["process_id"] = pid
    jax.distributed.initialize(**kwargs)
    return True


def _host_groups(devices: Sequence, devices_per_host: Optional[int]):
    """Group devices by ICI domain.  Real multi-host: by process_index.
    Single-process: contiguous groups of ``devices_per_host`` (simulated
    hosts for virtual-mesh tests); None = one group (all ICI)."""
    by_proc = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    if len(by_proc) > 1:
        return [by_proc[k] for k in sorted(by_proc)]
    if devices_per_host is None:
        return [list(devices)]
    if len(devices) % devices_per_host != 0:
        raise ValueError(
            f"{len(devices)} devices not divisible by "
            f"devices_per_host={devices_per_host}"
        )
    return [
        list(devices[i : i + devices_per_host])
        for i in range(0, len(devices), devices_per_host)
    ]


def make_hierarchical_mesh(
    model: int = 1,
    devices: Optional[Sequence] = None,
    devices_per_host: Optional[int] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """(data x model) mesh with the model axis pinned inside one ICI domain.

    ``data`` spans hosts (DCN) x any per-host spare devices; ``model``
    (row-partitioning, per-sweep O(n) collectives) never crosses a host
    boundary — a ``model`` larger than one host's device count raises
    instead of silently placing latency-critical collectives on DCN.

    Single-process with ``devices_per_host=None`` is equivalent to
    ``make_mesh`` (everything is one ICI domain).
    """
    devices = list(devices if devices is not None else jax.devices())
    groups = _host_groups(devices, devices_per_host)
    per_host = len(groups[0])
    if any(len(g) != per_host for g in groups):
        raise ValueError("hosts expose unequal device counts")
    if model <= 0 or per_host % model != 0:
        raise ValueError(
            f"model={model} must divide the per-host device count "
            f"{per_host}: the model (row) axis exchanges O(n) collectives "
            "per solver sweep / GNN layer and must stay on ICI, inside one "
            "host; shard the batch ('data') across hosts instead"
        )
    # grid[d, m]: host-major flat order chunked by ``model`` — each model
    # group is ICI-contiguous within one host; data stacks
    # (host, per-host spare).
    flat = [d for g in groups for d in g]
    grid = np.empty((len(flat) // model, model), dtype=object)
    for i, d in enumerate(flat):
        grid[i // model, i % model] = d
    return Mesh(grid, axis_names)


def global_batch_from_host_local(
    mesh: Mesh, local_batch, spec: P = P("data", "model", None)
):
    """Assemble the global sharded array from this process's host-local data.

    Multi-process: each process passes only ITS batch slice (global batch =
    concatenation over processes along the 'data' axis) and JAX builds the
    global array without any cross-host copy of the data itself
    (``jax.make_array_from_process_local_data``).  Single-process: a plain
    ``device_put`` of the full batch — same call site works in both modes,
    which is the point: the trainers don't fork on process_count.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, local_batch)
    return jax.device_put(local_batch, sharding)
