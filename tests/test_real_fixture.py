"""Vendored OR-Library-format fixture: parse -> solve -> exact optimality.

First real-instance-format coverage (reference data/processors.py:21-43 +
generate_dataset.py:91-124).  The fixture file is OR-Library `.assign`
format (n, then n*n integer costs), committed under data/real/.
"""

from pathlib import Path

import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.processors import iter_real_instances, parse_orlib_assign

FIXTURE = Path(__file__).resolve().parent.parent / "data" / "real" / "assignp200.assign.gz"
KNOWN_OPT = 267.0  # scipy linear_sum_assignment on the committed fixture


def test_parse_fixture():
    inst = parse_orlib_assign(FIXTURE)
    assert inst.cost.shape == (200, 200)
    assert inst.source == "orlib"
    assert inst.cost.min() >= 1 and inst.cost.max() <= 100


def test_fixture_known_optimum():
    inst = parse_orlib_assign(FIXTURE)
    r, c = scipy.optimize.linear_sum_assignment(inst.cost)
    assert float(inst.cost[r, c].sum()) == KNOWN_OPT


def test_native_solver_on_fixture():
    from lapgnn_tpu.solver import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    inst = parse_orlib_assign(FIXTURE)
    x, y, cost = native.lapjv_native(inst.cost)
    assert cost == pytest.approx(KNOWN_OPT, abs=1e-9)


def test_device_solver_on_fixture():
    import jax.numpy as jnp

    from lapgnn_tpu.solver.seeded import lapjv_seeded_single

    inst = parse_orlib_assign(FIXTURE)
    C = jnp.asarray(inst.cost, jnp.float32)
    n = C.shape[0]
    u0 = jnp.zeros(n, jnp.float32)
    v0 = jnp.min(C, axis=0)
    res = lapjv_seeded_single(C, u0, v0, gate="free_rows")
    x = np.asarray(res.col_of_row)
    assert sorted(x.tolist()) == list(range(n))
    got = float(inst.cost[np.arange(n), x].sum())
    assert got == pytest.approx(KNOWN_OPT, abs=1e-6)


def test_iter_real_instances_finds_fixture():
    found = [
        inst
        for inst in iter_real_instances([FIXTURE])
        if inst.name.startswith("assignp200")
    ]
    assert len(found) == 1
    assert found[0].cost.shape == (200, 200)
