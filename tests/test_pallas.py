"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.ops.pallas import pallas_col_min, pallas_min_trick, pallas_row_stats

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


def test_pallas_row_stats(rng):
    n = 256
    Cn = FAMILIES["uniform"](n, rng)
    C = jnp.asarray(Cn, jnp.float32)
    got = np.asarray(pallas_row_stats(C, interpret=INTERPRET))

    np.testing.assert_allclose(got[:, 0], Cn.min(1), atol=1e-6)
    np.testing.assert_allclose(got[:, 1], Cn.max(1), atol=1e-6)
    np.testing.assert_allclose(got[:, 2], Cn.mean(1), atol=1e-5)
    np.testing.assert_allclose(got[:, 3], Cn.std(1), atol=1e-5)
    # Entropy vs the reference formulation.
    Z = Cn.min(1, keepdims=True)
    e = np.exp(-(Cn - Z))
    p = e / (e.sum(1, keepdims=True) + 1e-9)
    ent = -(p * np.log(p + 1e-9)).sum(1)
    np.testing.assert_allclose(got[:, 4], ent, atol=1e-4)
    np.testing.assert_allclose(got[:, 5], (Cn <= Cn.min(1, keepdims=True) * 1.1).mean(1), atol=1e-6)


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
