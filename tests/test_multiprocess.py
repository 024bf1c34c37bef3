"""REAL multi-process distributed test (parallel/hostmesh.py).

Spawns two OS processes that each call ``initialize_distributed`` against a
localhost coordinator with 4 virtual CPU devices apiece (8 global), build
the hierarchical (data x model) mesh, and run a data-parallel psum over a
batch assembled with ``global_batch_from_host_local`` — the code path a
single-process virtual mesh cannot exercise: real process_index grouping,
cross-process collectives, and per-process local data feeding.

This is the TPU-pod story in miniature: each process sees only its local
devices (host), the mesh spans all of them, the model axis stays inside one
process's device group, and each process contributes only its slice of the
global batch.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
import numpy as np

# Pin the platform BEFORE jax import (dev-tunnel gotcha; see tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, os.environ["LAPGNN_REPO"])

from lapgnn_tpu.parallel import (
    global_batch_from_host_local,
    initialize_distributed,
    make_hierarchical_mesh,
)

ok = initialize_distributed(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PID_IDX"]),
)
assert ok, "initialize_distributed returned False with explicit coordinator"

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

# Hierarchical mesh from REAL process grouping (no devices_per_host needed).
mesh = make_hierarchical_mesh(model=2)
assert mesh.shape == {"data": 4, "model": 2}, mesh.shape
# every model group must lie inside one process
grid = np.asarray(mesh.devices)
for row in grid:
    assert len({d.process_index for d in row}) == 1, "model group spans hosts"

# Global batch: 8 instances over 'data'; each process feeds ITS 4.
pid = jax.process_index()
full = np.arange(8 * 4 * 4, dtype=np.float32).reshape(8, 4, 4)
local = full[pid * 4 : (pid + 1) * 4]
arr = global_batch_from_host_local(mesh, local, P("data", None, None))
assert arr.shape == (8, 4, 4), arr.shape

# Cross-process collective: global sum over the whole batch.
@jax.jit
def total(x):
    return jnp.sum(x)

got = float(total(arr))
want = float(full.sum())
assert abs(got - want) < 1e-3, (got, want)
print(f"WORKER_OK pid={pid} sum={got}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_hierarchical_mesh(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({"COORD": coord, "PID_IDX": str(pid), "LAPGNN_REPO": repo})
        # drop any inherited distribution config; the worker passes the
        # coordinator explicitly
        env.pop("JAX_COORDINATOR_ADDRESS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid}" in out, out
