"""Sharded end-to-end seeded solve on the 8-device virtual mesh.

Validates the north-star distributed path (parallel/solver.py): every phase
of the warm-started JV solve runs with the instance's rows partitioned over
the mesh, collectives move only O(n) vectors (asserted against the compiled
HLO), and the result is bit-identical in cost to the unsharded solve and
exactly optimal.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapgnn_tpu.parallel.mesh import make_mesh
from lapgnn_tpu.parallel.solver import (
    assert_no_matrix_allgather,
    make_sharded_pipeline,
    make_sharded_seeded_solve,
)
from lapgnn_tpu.solver.seeded import lapjv_seeded_single

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _known_instance(n, seed=0, noise=3e-3, dtype=np.float32):
    """Planted-optimum instance (shared generator; see data/generators.py)."""
    from lapgnn_tpu.data.generators import generate_planted_optimum_instance

    C, u_seed, _, opt = generate_planted_optimum_instance(
        n, seed=seed, noise=noise, dtype=dtype
    )
    v_seed = (C - u_seed[:, None]).min(axis=0).astype(dtype)
    return C, u_seed, v_seed, opt


@requires_8
@pytest.mark.parametrize("n", [256, 1024])
def test_sharded_solve_matches_unsharded_and_optimal(n):
    C, u_s, v_s, opt = _known_instance(n, seed=n)
    mesh = make_mesh(data=1, model=8)
    solve = make_sharded_seeded_solve(mesh)
    res = solve(jnp.asarray(C), jnp.asarray(u_s), jnp.asarray(v_s))

    x = np.asarray(res.col_of_row)
    assert sorted(x.tolist()) == list(range(n))
    got = float(C.astype(np.float64)[np.arange(n), x].sum())
    assert got == pytest.approx(opt, rel=1e-5)

    # Cost equality with the unsharded program (same algorithm, same input).
    single = jax.jit(functools.partial(lapjv_seeded_single, gate="free_rows"))
    res1 = single(jnp.asarray(C), jnp.asarray(u_s), jnp.asarray(v_s))
    x1 = np.asarray(res1.col_of_row)
    got1 = float(C.astype(np.float64)[np.arange(n), x1].sum())
    assert got == pytest.approx(got1, rel=1e-6)


@requires_8
def test_sharded_solve_no_matrix_allgather():
    n = 512
    mesh = make_mesh(data=1, model=8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    jitted = jax.jit(
        functools.partial(lapjv_seeded_single, gate="free_rows"),
        in_shardings=(
            NamedSharding(mesh, P("model", None)),
            NamedSharding(mesh, P("model")),
            NamedSharding(mesh, P()),
        ),
    )
    compiled = jitted.lower(
        jax.ShapeDtypeStruct((n, n), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
    ).compile()
    assert_no_matrix_allgather(compiled, n, 8)


@requires_8
@pytest.mark.slow
def test_sharded_pipeline_end_to_end():
    """features -> OneGNN -> min-trick -> sharded solve, one partitioned program."""
    from lapgnn_tpu.models import OneGNN
    from lapgnn_tpu.ops.features import row_features

    n = 256
    C, _, _, opt = _known_instance(n, seed=7)
    model = OneGNN(hidden=16, layers=1, dropout=0.0, topk=8)
    cost0 = jnp.asarray(C[None])
    params = model.init(jax.random.key(0), row_features(cost0), cost=cost0)

    mesh = make_mesh(data=1, model=8)
    run = make_sharded_pipeline(model, mesh)
    res = run(params, jnp.asarray(C))
    x = np.asarray(res.col_of_row)
    assert sorted(x.tolist()) == list(range(n))
    got = float(C.astype(np.float64)[np.arange(n), x].sum())
    # Untrained model -> poor seed, but the solve must still be exactly optimal.
    assert got == pytest.approx(opt, rel=1e-5)


@requires_8
@pytest.mark.slow
def test_sharded_pipeline_rank1_auto_no_matrix_allgather():
    """The rank-1 candidate's collectives are O(n) (matvec psum + replicated
    factor sorts): the full pipeline with seed_mode='auto' must still move
    no O(n^2) operand, and a noisy_linear instance must solve exactly with
    the analytic seed winning the selection."""
    from lapgnn_tpu.data.generators import FAMILIES
    from lapgnn_tpu.models import OneGNN
    from lapgnn_tpu.ops.features import row_features

    n = 256
    rng = np.random.default_rng(3)
    C = FAMILIES["noisy_linear"](n, rng).astype(np.float32)
    model = OneGNN(hidden=16, layers=1, dropout=0.0, topk=8)
    cost0 = jnp.asarray(C[None])
    params = model.init(jax.random.key(0), row_features(cost0), cost=cost0)

    mesh = make_mesh(data=1, model=8)
    run = make_sharded_pipeline(model, mesh)
    compiled = run.lower(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        ),
        jax.ShapeDtypeStruct((n, n), jnp.float32),
    ).compile()
    assert_no_matrix_allgather(compiled, n, 8)

    res = run(params, jnp.asarray(C))
    x = np.asarray(res.col_of_row)
    assert sorted(x.tolist()) == list(range(n))
    import scipy.optimize

    r, c = scipy.optimize.linear_sum_assignment(C.astype(np.float64))
    opt = float(C.astype(np.float64)[r, c].sum())
    got = float(C.astype(np.float64)[np.arange(n), x].sum())
    assert got == pytest.approx(opt, rel=1e-5)
    # Analytic seed quality: the solve must NOT have cold-fallen back.
    assert not bool(res.used_fallback)
