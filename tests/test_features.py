"""Feature parity tests vs an independent NumPy oracle of the reference spec
(gnn/features.py:161-243 for the 21-D row features)."""

import jax.numpy as jnp
import zlib

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
    rng = np.random.default_rng(zlib.crc32(f"{fam}:{n}".encode()))
    C = FAMILIES[fam](n, rng)
    got = np.asarray(row_features(jnp.asarray(C)))
    want = _row_features_oracle(C)
    assert got.shape == (n, 21)
    scale = np.abs(want).max(axis=0) + 1.0
    # Device features are float32; the oracle is float64.
    np.testing.assert_allclose(got / scale, want / scale, atol=3e-5, rtol=1e-4)


@pytest.mark.slow
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


@pytest.mark.slow
def test_graph_features_channel_values_vs_numpy_oracle(rng):
    """Pin every node/edge channel of graph_features to an independent NumPy
    oracle — shape/symmetry tests alone would let a channel swap or rescale
    ship silently and break reference-checkpoint compatibility."""
    from lapgnn_tpu.ops.features import (
        EPS,
        POS_FREQS,
        TAU,
        graph_features,
        positional_encodings,
    )

    n = 17  # odd: exercises single-rank medians
    C = FAMILIES["uniform"](n, rng).astype(np.float32)
    C[:, 3] = C[:, 4]  # ties
    gf = graph_features(jnp.asarray(C))

    Cd = C.astype(np.float64)

    def axis_stats(A, axis):
        med = np.median(A, axis=axis)
        dev = np.abs(A - np.expand_dims(med, axis))
        mad = np.maximum(np.median(dev, axis=axis), EPS)
        sh = A - A.min(axis=axis, keepdims=True)
        e = np.exp(-sh)
        p = e / (e.sum(axis=axis, keepdims=True) + EPS)
        ent = -(p * np.log(p + EPS)).sum(axis=axis)
        return (A.min(axis=axis), A.max(axis=axis), A.mean(axis=axis),
                A.std(axis=axis), med, mad, ent)

    r = axis_stats(Cd, 1)
    c = axis_stats(Cd, 0)
    row_ref = np.stack(r[:4] + (r[5], r[6]), axis=-1)  # min,max,mean,std,mad,ent
    col_ref = np.stack(c[:4] + (c[5], c[6]), axis=-1)
    np.testing.assert_allclose(np.asarray(gf.row_feat)[:, :6], row_ref, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gf.col_feat)[:, :6], col_ref, atol=5e-5)
    pos = np.asarray(positional_encodings(n))
    np.testing.assert_allclose(np.asarray(gf.row_feat)[:, 6:], pos, atol=1e-6)

    ef = np.asarray(gf.edge_feat)
    np.testing.assert_allclose(
        ef[..., 0], (Cd - r[4][:, None]) / r[5][:, None], atol=5e-4
    )
    # normalized ranks via double argsort
    def ranks(A, axis):
        order = np.argsort(A, axis=axis, kind="stable")
        rk = np.empty_like(order)
        np.put_along_axis(rk, order, np.arange(A.shape[axis]).reshape(
            (-1, 1) if axis == 0 else (1, -1)) * np.ones_like(order), axis=axis)
        return rk / max(1, A.shape[axis] - 1)
    np.testing.assert_allclose(ef[..., 3], Cd - r[0][:, None], atol=5e-5)  # row gap
    np.testing.assert_allclose(ef[..., 4], Cd - c[0][None, :], atol=5e-5)  # col gap
    row_tie = ((Cd - r[0][:, None]) <= TAU).sum(axis=1) / n
    col_tie = ((Cd - c[0][None, :]) <= TAU).sum(axis=0) / n
    np.testing.assert_allclose(ef[..., 5], np.repeat(row_tie[:, None], n, 1), atol=1e-6)
    np.testing.assert_allclose(ef[..., 6], np.repeat(col_tie[None, :], n, 0), atol=1e-6)
    np.testing.assert_allclose(ef[..., 7], np.repeat(r[6][:, None], n, 1), atol=5e-5)
    np.testing.assert_allclose(ef[..., 8], np.repeat(c[6][None, :], n, 0), atol=5e-5)
    np.testing.assert_allclose(ef[..., 9], 0.0, atol=0)  # reduced: zeros w/o u
    # rank channels: values in [0,1], each row/col a permutation of k/(n-1)
    expect = np.arange(n) / (n - 1)
    for i in range(n):
        np.testing.assert_allclose(np.sort(ef[i, :, 1]), expect, atol=1e-6)
        np.testing.assert_allclose(np.sort(ef[:, i, 2]), expect, atol=1e-6)
