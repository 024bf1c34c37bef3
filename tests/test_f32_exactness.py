"""f32 exactness stress suite for the device solver (adversarial instances).

The native solver is float64 like the reference (lapjv.h:55); the device
solver runs float32.  Policy under test (solver/jv.py clamp + polish,
solver/verification.certify_assignment):

  * instances whose optima are separated by more than a few f32 ulps are
    solved EXACTLY in f32 — including tie-heavy and near-tie instances;
  * below that, the suboptimality is bounded by n * polish_eps, and the
    f64 certificate + native polish (pipeline certify=True) restores
    exactness.

These run in f32 on the CPU backend — the same dtype path the TPU executes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.solver.seeded import lapjv_seeded_single
from lapgnn_tpu.solver.verification import certify_assignment

SOLVE = jax.jit(functools.partial(lapjv_seeded_single, gate="free_rows"))


def _device_solve(C64, seed_noise=0.0, rng=None):
    n = C64.shape[0]
    C32 = jnp.asarray(C64, jnp.float32)
    u0 = np.zeros(n, np.float32)
    if seed_noise and rng is not None:
        u0 += rng.normal(0, seed_noise, n).astype(np.float32)
    v0 = jnp.min(C32 - u0[:, None], axis=0)
    res = SOLVE(C32, jnp.asarray(u0), v0)
    x = np.asarray(res.col_of_row)
    assert sorted(x.tolist()) == list(range(n)), "not a permutation"
    return x, np.asarray(res.v, np.float64)


def _opt(C64):
    r, c = scipy.optimize.linear_sum_assignment(C64)
    return float(C64[r, c].sum())


@pytest.mark.parametrize("levels", [4, 8, 64])
def test_tie_heavy_binned_exact(levels, rng):
    """Massive tie groups: separations are multiples of 1/levels >> f32 ulp."""
    n = 512
    C = np.floor(rng.uniform(0, 1, (n, n)) * levels) / levels
    x, _ = _device_solve(C)
    got = float(C[np.arange(n), x].sum())
    assert got == pytest.approx(_opt(C), abs=1e-4)


def test_near_tie_1e4_separation_exact(rng):
    """Separations at 1e-4 — 1000x the f32 ulp — must be resolved exactly."""
    n = 512
    C = np.floor(rng.uniform(0, 1, (n, n)) * 8) / 8 + rng.uniform(0, 1e-4, (n, n))
    x, _ = _device_solve(C)
    got = float(C[np.arange(n), x].sum())
    opt = _opt(C)
    assert got == pytest.approx(opt, abs=n * 1e-6)


def test_sub_ulp_separation_bounded_and_certified(rng):
    """Separations at 1e-5 approach f32 resolution: gap must stay within the
    documented bound, and the f64 certificate must quantify it."""
    n = 512
    C = np.floor(rng.uniform(0, 1, (n, n)) * 8) / 8 + rng.uniform(0, 1e-5, (n, n))
    x, v = _device_solve(C)
    got = float(C[np.arange(n), x].sum())
    opt = _opt(C)
    # polish_eps = 8 ulp * (1 + max C) ~ 2e-6; bound is n * polish_eps.
    assert got - opt <= n * 4e-6

    certified, violation, gap_bound = certify_assignment(C, x, v, tol=1e-6)
    # The certificate's bound must dominate the true gap.
    assert got - opt <= gap_bound + 1e-9


@pytest.mark.slow
def test_certify_and_polish_restores_exactness(rng):
    """pipeline.solve(certify=True) on an adversarial instance: exact."""
    pytest.importorskip("lapgnn_tpu.solver.native")
    from lapgnn_tpu.models import OneGNN
    from lapgnn_tpu.ops.features import row_features
    from lapgnn_tpu.pipeline import WarmStartPipeline
    from lapgnn_tpu.solver import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")

    n = 256
    C = np.floor(rng.uniform(0, 1, (n, n)) * 8) / 8 + rng.uniform(0, 1e-6, (n, n))
    model = OneGNN(hidden=16, layers=1, dropout=0.0, topk=8)
    c0 = jnp.asarray(C[None], jnp.float32)
    params = model.init(jax.random.key(0), row_features(c0), cost=c0)
    # certify_tol sets the exactness bar: separations here are ~1e-6, so the
    # certificate must be tighter than that to force the f64 polish.
    pipe = WarmStartPipeline(model, params, mode="device", certify_tol=1e-10)
    out = pipe.solve(C.astype(np.float32), certify=True)
    assert out["certified"].all()
    got = float(C[np.arange(n), out["col_of_row"][0]].sum())
    assert got == pytest.approx(_opt(C), abs=1e-9)


def test_worst_case_antidiagonal_no_livelock(rng):
    """Anti-diagonal instances force long augmenting chains; the capped
    multi-flip must fall back to the uncapped single flip, not spin."""
    n = 128
    C = -np.add.outer(np.arange(n), np.arange(n)).astype(np.float64) + 2.0 * n
    x, _ = _device_solve(C)
    got = float(C[np.arange(n), x].sum())
    assert got == pytest.approx(_opt(C), rel=1e-6)


def test_path_cap_fallback_exercised(monkeypatch):
    """With a tiny path cap the fallback path must still solve exactly."""
    import lapgnn_tpu.solver.jv as jvmod
    from lapgnn_tpu.solver.jv import lapjv_single

    monkeypatch.setattr(jvmod, "_PATH_CAP", 4)
    rng = np.random.default_rng(5)
    C = rng.uniform(0, 1, (48, 48))
    x, _, cost = jax.jit(lapjv_single)(jnp.asarray(C, jnp.float32))
    xs = np.asarray(x)
    assert sorted(xs.tolist()) == list(range(48))
    assert float(cost) == pytest.approx(_opt(C), abs=1e-4)


def test_certificate_rejects_bad_assignment(rng):
    n = 64
    C = rng.uniform(0, 1, (n, n))
    x = np.arange(n)  # identity: almost surely suboptimal
    v = np.min(C, axis=0)
    certified, violation, bound = certify_assignment(C, x, v, tol=1e-6)
    assert not certified and violation > 1e-3


@pytest.mark.parametrize("noise", [0.0, 1e-4])
def test_rank1_monge_tie_structure_exact(noise, rng):
    """Exact (or near-exact) rank-1 costs seeded with the analytic Monge
    duals (ops/rank1.py): under these duals EVERY entry along the sorted
    order is tight or near-tight — the densest tie graph the multi-path
    augmentation can face.  The f32 device solve must stay exact and must
    not fall back (the analytic seed is near-oracle here)."""
    from lapgnn_tpu.ops.rank1 import rank1_duals

    n = 384
    a = rng.normal(size=n)
    b = rng.normal(size=n)
    C64 = np.outer(a, b) + (rng.normal(size=(n, n)) * noise if noise else 0.0)
    C64 -= C64.min()

    C32 = jnp.asarray(C64, jnp.float32)
    u0, _ = rank1_duals(C32)
    v0 = jnp.min(C32 - u0[:, None], axis=0)
    res = SOLVE(C32, u0, v0)
    x = np.asarray(res.col_of_row)
    assert sorted(x.tolist()) == list(range(n)), "not a permutation"
    got = float(C64[np.arange(n), x].sum())
    opt = _opt(C64)
    assert got == pytest.approx(opt, abs=max(1e-6, 1e-5 * abs(opt)))
    assert not bool(res.used_fallback)


def test_certificate_rejects_nan_and_nonpermutation():
    """max(0.0, nan) == 0.0 previously CERTIFIED NaN-poisoned solves; the
    LP-duality premise also requires a bijection — both must now fail."""
    C = np.array([[0.0, 10.0], [0.0, 10.0]])
    ok, viol, bound = certify_assignment(C, np.array([0, 0]), np.array([0.0, 10.0]))
    assert not ok and viol == np.inf

    Cn = np.array([[0.0, 1.0], [np.nan, 0.0]])
    ok, viol, _ = certify_assignment(Cn, np.array([0, 1]), np.zeros(2))
    assert not ok and not np.isfinite(viol) or viol > 0  # never certified
    assert not ok


def test_verify_gate_rejects_nan_and_bad_rows():
    """The cross-solver gate is NaN-hostile and checks BOTH index vectors."""
    from lapgnn_tpu.solver.verification import verify_solver_correctness

    class NanSolver:
        name = "nan"

        def solve(self, C):
            n = C.shape[0]
            return np.arange(n), np.arange(n), float("nan")

    class DupRowSolver:
        name = "duprow"

        def solve(self, C):
            n = C.shape[0]
            return np.zeros(n, np.int64), np.arange(n), float(C[0].sum())

    C = np.ones((3, 3))
    with pytest.raises(AssertionError):
        verify_solver_correctness(C, solvers=[NanSolver()])
    with pytest.raises(AssertionError):
        verify_solver_correctness(C, solvers=[DupRowSolver()])


def test_verify_gate_seeded_typeerror_not_swallowed():
    """A TypeError raised INSIDE a seeded solver must propagate, not be
    silently retried unseeded (which would skip the code path under test)."""
    from lapgnn_tpu.solver.verification import verify_solver_correctness

    class BrokenSeeded:
        name = "broken"

        def solve(self, C, u=None, v=None):
            raise TypeError("internal dtype misuse")

    with pytest.raises(TypeError):
        verify_solver_correctness(np.ones((2, 2)), solvers=[BrokenSeeded()])
