"""Cost-family generator tests (reference: solvers/generators.py semantics)."""

import numpy as np
import pytest

from lapgnn_tpu.data import generators as G


ALL_FAMILIES = sorted(G.FAMILIES)


def test_registry_contains_reference_families():
    # data/generators.py:72-81 in the reference.
    for fam in ["uniform", "metric", "low_rank", "block", "clustered", "noisy_linear", "tie", "sparse"]:
        assert fam in G.FAMILIES


@pytest.mark.parametrize("fam", ALL_FAMILIES)
def test_family_shapes_and_determinism(fam):
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    C1 = G.FAMILIES[fam](32, rng1)
    C2 = G.FAMILIES[fam](32, rng2)
    assert C1.shape == (32, 32)
    assert C1.dtype == np.float64
    np.testing.assert_array_equal(C1, C2)


def test_uniform_range():
    C = G.generate_uniform_costs(64, seed=1)
    assert C.min() >= 0.0 and C.max() <= 1.0


def test_sparse_feasible_and_sentinel():
    C = G.generate_sparse_costs(50, sparsity_ratio=0.1, seed=3)
    allowed = C < G.SPARSE_FORBIDDEN
    assert allowed.any(axis=1).all(), "every row needs an allowed edge"
    assert allowed.any(axis=0).all(), "every column needs an allowed edge"
    assert set(np.unique(C[~allowed])) == {G.SPARSE_FORBIDDEN}


def test_dataset_sparse_sentinel():
    rng = np.random.default_rng(0)
    C = G.FAMILIES["sparse"](40, rng)
    forbidden = C == G.DATASET_SPARSE_FORBIDDEN
    assert forbidden.any()
    assert (~forbidden).any(axis=1).all()


def test_identity_like_optimum_is_diagonal():
    C = G.generate_identity_like_costs(16)
    assert np.trace(C) == 0.0
    assert C[0, 1] == 1.0


def test_metric_symmetry_zero_diag():
    C = G.generate_metric_costs(20, seed=5)
    np.testing.assert_allclose(C, C.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(C), 0.0, atol=1e-12)


def test_near_diagonal_prefers_diagonal():
    C = G.generate_near_diagonal_costs(64, noise_level=0.0, seed=0)
    assert np.diag(C).mean() < C.mean()


def test_worst_case_antidiagonal():
    C = G.generate_worst_case_costs(8)
    assert C[0, 7] == 1.0 and C[7, 0] == 1.0
    assert C[0, 0] == 8.0


def test_clustered_blocks_cheaper():
    C = G.generate_clustered_costs(64, blocks=4, noise=0.0, seed=2)
    in_block = C[:16, :16].mean()
    off_block = C[:16, 16:].mean()
    assert in_block < off_block
