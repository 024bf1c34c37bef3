"""Feature parity tests vs an independent NumPy oracle of the reference spec
(gnn/features.py:161-243 for the 21-D row features)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.ops.features import (
    EDGE_FEATURE_DIM,
    NODE_FEATURE_DIM,
    ROW_FEATURE_DIM,
    graph_features,
    positional_encodings,
    row_features,
)

EPS = 1e-9


def _row_features_oracle(C):
    """Direct NumPy transcription of the 21-D feature spec."""
    C = C.astype(np.float64)
    n, m = C.shape
    row_min = C.min(1)
    feats = [
        row_min,
        C.max(1),
        C.mean(1),
        C.std(1),
        np.maximum(np.median(np.abs(C - np.median(C, 1)[:, None]), 1), EPS),
    ]
    Z = C.min(1, keepdims=True)
    e = np.exp(-(C - Z))
    p = e / (e.sum(1, keepdims=True) + EPS)
    feats.append(-(p * np.log(p + EPS)).sum(1))
    s = np.sort(C, 1)
    gap = s[:, 1] - s[:, 0]
    feats.append(gap)
    feats.append(gap / (s[:, -1] - s[:, 0] + EPS))
    k = min(10, m)
    feats.append(s[:, :k].mean(1))
    feats.append(s[:, :k].std(1))
    feats.append(1.0 / (np.diff(s, axis=1).mean(1) + EPS))
    feats.append((C <= row_min[:, None] * 1.1).mean(1))
    feats.append((C == C.min(0)[None, :]).sum(1) / m)
    base = np.stack(feats, 1)
    pos = np.arange(n, dtype=np.float64)
    scale = max(1, n - 1)
    pe = []
    for f in (1, 2, 4, 8):
        ang = 2 * np.pi * pos * f / scale
        pe += [np.sin(ang), np.cos(ang)]
    return np.concatenate([base, np.stack(pe, -1)], axis=1)


def test_dims():
    assert ROW_FEATURE_DIM == 21
    assert NODE_FEATURE_DIM == 14
    assert EDGE_FEATURE_DIM == 10


@pytest.mark.parametrize("fam", ["uniform", "metric", "tie"])
@pytest.mark.parametrize("n", [8, 51])
def test_row_features_match_oracle(fam, n):
    rng = np.random.default_rng(hash((fam, n)) % 2**31)
    C = FAMILIES[fam](n, rng)
    got = np.asarray(row_features(jnp.asarray(C)))
    want = _row_features_oracle(C)
    assert got.shape == (n, 21)
    scale = np.abs(want).max(axis=0) + 1.0
    # Device features are float32; the oracle is float64.
    np.testing.assert_allclose(got / scale, want / scale, atol=3e-5, rtol=1e-4)


def test_row_features_batch_consistent(rng):
    C = np.stack([FAMILIES["uniform"](16, rng) for _ in range(3)])
    batched = np.asarray(row_features(jnp.asarray(C)))
    for b in range(3):
        single = np.asarray(row_features(jnp.asarray(C[b])))
        scale = np.abs(single).max(axis=0) + 1.0  # f32 reduction-order slack
        np.testing.assert_allclose(batched[b] / scale, single / scale, atol=1e-5)


def test_positional_encoding_shape_and_range():
    pe = np.asarray(positional_encodings(33))
    assert pe.shape == (33, 8)
    assert np.abs(pe).max() <= 1.0 + 1e-6


def test_graph_features_shapes(rng):
    C = FAMILIES["uniform"](24, rng)
    gf = graph_features(jnp.asarray(C))
    assert gf.row_feat.shape == (24, 14)
    assert gf.col_feat.shape == (24, 14)
    assert gf.edge_feat.shape == (24, 24, 10)


def test_graph_features_symmetry(rng):
    """Row stats of C == col stats of C.T for the shared channels."""
    C = FAMILIES["uniform"](20, rng)
    a = graph_features(jnp.asarray(C))
    b = graph_features(jnp.asarray(C.T))
    np.testing.assert_allclose(
        np.asarray(a.row_feat), np.asarray(b.col_feat), atol=1e-5
    )


def test_graph_features_reduced_cost_channel(rng):
    C = FAMILIES["uniform"](16, rng)
    u = rng.normal(0, 0.1, 16)
    gf = graph_features(jnp.asarray(C), include_reduced_cost=True, u=jnp.asarray(u))
    red = np.asarray(gf.edge_feat[..., 9])
    # v from the min-trick makes every column's min reduced cost zero.
    np.testing.assert_allclose(red.min(axis=0), 0.0, atol=1e-5)
    gf0 = graph_features(jnp.asarray(C))
    np.testing.assert_allclose(np.asarray(gf0.edge_feat[..., 9]), 0.0)


def test_row_ranks_channel(rng):
    C = FAMILIES["uniform"](12, rng)
    gf = graph_features(jnp.asarray(C))
    rr = np.asarray(gf.edge_feat[..., 1])
    # Each row's ranks are a permutation of {0, 1/(n-1), ..., 1}.
    for i in range(12):
        np.testing.assert_allclose(np.sort(rr[i]), np.arange(12) / 11, atol=1e-6)
