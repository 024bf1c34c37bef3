"""Synthetic instance, HDF5 roundtrip, and split-planner tests."""

import numpy as np
import pytest

from lapgnn_tpu.data.h5io import H5Reader, H5Writer
from lapgnn_tpu.data.splits import plan_bucket
from lapgnn_tpu.data.synthetic import generate_synthetic_instance
from lapgnn_tpu.ops.host_dual import check_dual_and_match_np


@pytest.mark.parametrize("fam", ["uniform", "tie", "sparse"])
def test_synthetic_instance_labels_consistent(fam):
    rng = np.random.default_rng(0)
    inst = generate_synthetic_instance(fam, 24, rng)
    assert inst.cost.shape == (24, 24)
    # Matching is optimal and duals certify it.
    check_dual_and_match_np(inst.cost, inst.u, inst.v, inst.rows, inst.cols)


def test_synthetic_instance_dual_noise():
    rng = np.random.default_rng(1)
    inst = generate_synthetic_instance(
        "uniform", 16, rng, dual_noise_prob=1.0, noise_std=0.1
    )
    assert inst.noise_std == 0.1
    # Still feasible after re-projection.
    red = inst.cost - inst.u[:, None] - inst.v[None, :]
    assert red.min() >= -1e-8


def test_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    insts = [
        generate_synthetic_instance("uniform", n, rng) for n in (8, 12, 8)
    ]
    path = tmp_path / "train.h5"
    with H5Writer(path) as w:
        for inst in insts:
            w.append(inst)
    with H5Reader(path) as r:
        assert len(r) == 3
        assert r.sizes().tolist() == [8, 12, 8]
        for i, inst in enumerate(insts):
            rec = r[i]
            np.testing.assert_array_equal(rec["cost"], inst.cost)
            np.testing.assert_array_equal(rec["u"], inst.u)
            np.testing.assert_array_equal(rec["rows"], inst.rows)
            assert rec["family"] == inst.family
            assert abs(rec["opt_cost"] - inst.cost[inst.rows, inst.cols].sum()) < 1e-12


def test_plan_bucket_ratios():
    rng = np.random.default_rng(3)
    labels = plan_bucket(100, {"train": 0.8, "val": 0.1, "test": 0.1}, rng)
    assert len(labels) == 100
    assert labels.count("train") == 80
    assert labels.count("val") == 10
    assert labels.count("test") == 10


def test_plan_bucket_largest_remainder():
    rng = np.random.default_rng(4)
    labels = plan_bucket(10, {"a": 0.55, "b": 0.45}, rng)
    assert sorted([labels.count("a"), labels.count("b")]) == [4, 6]


def test_plan_bucket_empty():
    rng = np.random.default_rng(5)
    assert plan_bucket(0, {"a": 1.0}, rng) == []


def test_iter_bucket_assignments():
    from lapgnn_tpu.data.splits import iter_bucket_assignments

    out = list(
        iter_bucket_assignments(
            [("a", 10), ("b", 4)], {"train": 0.5, "val": 0.5}, seed=1
        )
    )
    assert len(out) == 14
    a_rows = [r for r in out if r[0] == "a"]
    assert len(a_rows) == 10
    labels = [r[2] for r in a_rows]
    assert labels.count("train") == 5 and labels.count("val") == 5
