"""Driver entry points: compile check + multi-chip dryrun must keep working."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge  # noqa: E402

pytestmark = pytest.mark.slow  # 8-device CPU-mesh dryruns (~2 min): the driver exercises these separately


def test_entry_jits_and_runs():
    fn, args = ge.entry()
    u, v = jax.jit(fn)(*args)
    assert u.shape == (4, 64) and v.shape == (4, 64)
    # min-trick guarantees dual feasibility.
    params, cost = args
    red = np.asarray(cost) - np.asarray(u)[..., :, None] - np.asarray(v)[..., None, :]
    assert red.min() >= -1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8(monkeypatch):
    # The driver-facing default executes the n=4096 DualGNN train step
    # (round 5); in the test suite pin the r4 size so two dryruns don't add
    # ~10 min of virtual-device CPU time — the 4096 path itself is covered
    # by the driver's MULTICHIP run.
    monkeypatch.setenv("LAPGNN_DRYRUN_DUAL_N", "2048")
    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_dryrun_multichip_odd_mesh(monkeypatch):
    monkeypatch.setenv("LAPGNN_DRYRUN_DUAL_N", "2048")
    ge.dryrun_multichip(4)
