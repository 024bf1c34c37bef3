"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.ops.pallas import pallas_col_min, pallas_min_trick

INTERPRET = jax.default_backend() == "cpu"


@pytest.mark.parametrize("n", [64, 256, 512])
def test_pallas_col_min(n, rng):
    C = jnp.asarray(FAMILIES["uniform"](n, rng), jnp.float32)
    got = pallas_col_min(C, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(C).min(axis=0), atol=1e-6)


def test_pallas_col_min_odd_size(rng):
    C = jnp.asarray(FAMILIES["uniform"](100, rng), jnp.float32)
    got = pallas_col_min(C, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(C).min(axis=0), atol=1e-6)


@pytest.mark.parametrize("n", [64, 512])
def test_pallas_min_trick(n, rng):
    C = jnp.asarray(FAMILIES["uniform"](n, rng), jnp.float32)
    u = jnp.asarray(rng.normal(0, 0.3, n), jnp.float32)
    got = pallas_min_trick(C, u, interpret=INTERPRET)
    want = (np.asarray(C) - np.asarray(u)[:, None]).min(axis=0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_pallas_feature_stats_vs_numpy_oracle(rng):
    """Direct NumPy-oracle check of the fused feature kernel's single-pass
    channels (min/max/mean/std/entropy/near-best + exact median/MAD/k-stats)
    — independent of the XLA row_features path the parity test compares
    against.  (Migrated from the deleted rowstats.py exemplar kernel.)"""
    from lapgnn_tpu.ops.pallas.features import pallas_row_features_stats

    n = 256
    Cn = FAMILIES["uniform"](n, rng)
    C = jnp.asarray(Cn, jnp.float32)
    got = np.asarray(pallas_row_features_stats(C, interpret=INTERPRET))

    np.testing.assert_allclose(got[:, 0], Cn.min(1), atol=1e-6)
    np.testing.assert_allclose(got[:, 1], Cn.max(1), atol=1e-6)
    np.testing.assert_allclose(got[:, 2], Cn.mean(1), atol=1e-5)
    np.testing.assert_allclose(got[:, 3], Cn.std(1), atol=1e-5)
    med = np.median(Cn.astype(np.float32), axis=1)
    np.testing.assert_allclose(got[:, 4], np.maximum(
        np.median(np.abs(Cn.astype(np.float32) - med[:, None]), axis=1), 1e-9
    ), rtol=1e-6)
    # Entropy vs the reference formulation.
    Z = Cn.min(1, keepdims=True)
    e = np.exp(-(Cn - Z))
    p_ = e / (e.sum(1, keepdims=True) + 1e-9)
    ent = -(p_ * np.log(p_ + 1e-9)).sum(1)
    np.testing.assert_allclose(got[:, 5], ent, atol=1e-4)
    srt = np.sort(Cn.astype(np.float32), axis=1)
    np.testing.assert_allclose(got[:, 8], srt[:, :10].mean(1), rtol=1e-5)
    np.testing.assert_allclose(got[:, 9], srt[:, :10].std(1), atol=1e-5)
    np.testing.assert_allclose(
        got[:, 11], (Cn <= Cn.min(1, keepdims=True) * 1.1).mean(1), atol=1e-6
    )


def test_pallas_two_min(rng):
    from lapgnn_tpu.ops.pallas import pallas_two_min

    n = 256
    C = jnp.asarray(FAMILIES["uniform"](n, rng), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.2, n), jnp.float32)
    min1, min2, j1 = pallas_two_min(C, v, interpret=INTERPRET)
    red = np.asarray(C) - np.asarray(v)[None, :]
    s = np.sort(red, axis=1)
    np.testing.assert_allclose(np.asarray(min1), s[:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(min2), s[:, 1], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(j1), red.argmin(axis=1))


@pytest.mark.parametrize("fam", ["uniform", "noisy_linear", "tie", "sparse", "metric"])
@pytest.mark.parametrize("n", [31, 64])
def test_pallas_feature_stats_parity(fam, n, rng):
    """Fused sort-free feature kernel == XLA row_features channels 0..12,
    all families, odd and even sizes (odd m exercises the single-rank median;
    even m the lo/hi tie path; tie/sparse exercise heavy duplicates)."""
    from lapgnn_tpu.ops.features import row_features
    from lapgnn_tpu.ops.pallas.features import pallas_row_features_stats

    C = jnp.asarray(FAMILIES[fam](n, rng), jnp.float32)
    ref = np.asarray(row_features(C))[:, :13]
    got = np.asarray(pallas_row_features_stats(C, interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_pallas_feature_kernel_exact_selection(rng):
    """The bitwise bisection returns the exact order statistic: median/MAD
    on adversarial near-tie data (1e-7-separated values) match NumPy's exact
    median bit-for-bit."""
    from lapgnn_tpu.ops.pallas.features import pallas_row_features_stats

    n = 32
    base = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    C = np.repeat(base, n, axis=1) + (
        rng.integers(0, 3, (n, n)).astype(np.float32) * 1e-7
    )
    got = np.asarray(
        pallas_row_features_stats(jnp.asarray(C), interpret=INTERPRET)
    )
    med_exact = np.median(C.astype(np.float64), axis=1).astype(np.float32)
    mad_exact = np.median(
        np.abs(C.astype(np.float64) - np.median(C.astype(np.float64), axis=1)[:, None]),
        axis=1,
    ).astype(np.float32)
    # channel 4 is MAD (floored at EPS); median itself feeds MAD
    np.testing.assert_allclose(got[:, 4], np.maximum(mad_exact, 1e-9), atol=2e-7)
    # reconstruct median check through k_mean at k=10 being below median
    assert np.all(got[:, 8] <= med_exact + 1e-6)


def test_fast_row_features_gated_off_by_default(rng, monkeypatch):
    """Without LAPGNN_PALLAS_FEATURES=1 (or off-TPU) the routing falls back
    to the XLA path and returns the full 21-D tensor unchanged."""
    from lapgnn_tpu.ops.features import fast_row_features, row_features

    monkeypatch.delenv("LAPGNN_PALLAS_FEATURES", raising=False)
    C = jnp.asarray(FAMILIES["uniform"](16, rng), jnp.float32)[None]
    np.testing.assert_array_equal(
        np.asarray(fast_row_features(C)), np.asarray(row_features(C))
    )


def test_fast_row_features_forced_glue_parity(rng):
    """The Pallas-routed branch's glue (batch flatten/vmap/pos-encode concat)
    matches row_features end-to-end — exercised off-TPU via _force_pallas."""
    from lapgnn_tpu.ops.features import fast_row_features, row_features

    C = jnp.asarray(
        np.stack([FAMILIES["uniform"](32, rng) for _ in range(3)]), jnp.float32
    ).reshape(3, 1, 32, 32)[:, 0]  # (3, 32, 32)
    got = np.asarray(fast_row_features(C, _force_pallas=True))
    ref = np.asarray(row_features(C))
    assert got.shape == ref.shape == (3, 32, 21)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
    # unbatched squeeze path too
    got1 = np.asarray(fast_row_features(C[0], _force_pallas=True))
    np.testing.assert_allclose(got1, ref[0], rtol=2e-5, atol=2e-6)
