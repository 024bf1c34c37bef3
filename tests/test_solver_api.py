"""Solver wrapper classes + cross-solver verification gate + timing harness."""

import numpy as np
import pytest

from lapgnn_tpu.bench.harness import time_rigorous
from lapgnn_tpu.data.generators import FAMILIES, generate_sparse_costs
from lapgnn_tpu.ops.host_dual import oracle_duals_np
from lapgnn_tpu.solver.api import (
    JAXSolver,
    LAPMODSolver,
    LAPSolver,
    SciPySolver,
    SeededJAXSolver,
    SeededLAPSolver,
    WarmStartLAPSolver,
)
from lapgnn_tpu.solver.verification import verify_solver_correctness


def test_verify_solver_correctness_gate(rng):
    C = FAMILIES["uniform"](32, rng)
    costs = verify_solver_correctness(C)
    assert set(costs) == {"scipy", "lap", "seeded_lap"}


def test_verify_with_jax_solvers(rng):
    import jax.numpy as jnp

    C = FAMILIES["uniform"](24, rng)
    u, v = oracle_duals_np(C)
    costs = verify_solver_correctness(
        C,
        solvers=[
            SciPySolver(),
            LAPSolver(),
            JAXSolver(dtype=jnp.float64),
            SeededJAXSolver(dtype=jnp.float64),
        ],
        u=u,
        v=v,
    )
    assert len(costs) == 4


def test_warmstart_reduced_cost_solver(rng):
    C = FAMILIES["uniform"](24, rng)
    u, v = oracle_duals_np(C)
    rows, cols, cost = WarmStartLAPSolver().solve(C, u=u, v=v)
    _, _, opt = SciPySolver().solve(C)
    assert abs(cost - opt) < 1e-9


def test_lapmod_solver_sparse(rng):
    C = generate_sparse_costs(40, sparsity_ratio=0.3, seed=1)
    rows, cols, cost = LAPMODSolver(forbidden_threshold=50.0, sentinel=100.0).solve(C)
    _, _, opt = SciPySolver().solve(C)
    assert abs(cost - opt) < 1e-9


def test_timing_harness_stats():
    stats = time_rigorous(lambda: sum(range(100)), warmups=1, repeats=5)
    assert stats["success"]
    assert stats["min"] <= stats["median"] <= stats["max"]
    assert stats["repeats"] == 5


def test_timing_harness_failure_is_graceful():
    def boom():
        raise ValueError("nope")

    stats = time_rigorous(boom, warmups=1, repeats=2)
    assert not stats["success"]
    assert "nope" in stats["error"]
