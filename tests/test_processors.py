"""Real-data processor tests (local-file paths only; downloads are gated)."""

import gzip

import numpy as np
import pytest

from lapgnn_tpu.data.processors import (
    iter_real_instances,
    normalize_cost_matrix,
    parse_orlib_assign,
    string_links_to_cost,
)


def test_parse_orlib_assign(tmp_path):
    n = 3
    costs = np.arange(9, dtype=float).reshape(3, 3)
    body = f"{n}\n" + "\n".join(" ".join(str(int(x)) for x in row) for row in costs)
    p = tmp_path / "toy.assign"
    p.write_text(body)
    inst = parse_orlib_assign(p)
    np.testing.assert_array_equal(inst.cost, costs)
    assert inst.source == "orlib"


def test_parse_orlib_assign_gzip(tmp_path):
    p = tmp_path / "toy.assign.gz"
    with gzip.open(p, "wt") as f:
        f.write("2\n1 2\n3 4\n")
    inst = parse_orlib_assign(p)
    np.testing.assert_array_equal(inst.cost, [[1, 2], [3, 4]])


def test_parse_orlib_truncated_raises(tmp_path):
    p = tmp_path / "bad.assign"
    p.write_text("3\n1 2 3 4")
    with pytest.raises(ValueError):
        parse_orlib_assign(p)


def test_string_links_to_cost(tmp_path):
    p = tmp_path / "toy_links.txt"
    p.write_text("protein1 protein2 combined_score\nA B 900\nB C 500\n")
    inst = string_links_to_cost(p)
    C = inst.cost
    assert C.shape == (3, 3)
    # cost = 1 - score/1000, symmetric, zero diagonal, 1.0 for missing links.
    assert abs(C[0, 1] - 0.1) < 1e-12
    assert abs(C[1, 2] - 0.5) < 1e-12
    assert C[0, 2] == 1.0
    np.testing.assert_allclose(C, C.T)
    np.testing.assert_allclose(np.diag(C), 0.0)


def test_iter_real_instances_multiplexer(tmp_path):
    a = tmp_path / "x.assign"
    a.write_text("2\n1 2\n3 4\n")
    b = tmp_path / "y_links.txt"
    b.write_text("A B 800\n")
    got = list(iter_real_instances([a, b]))
    assert [g.source for g in got] == ["orlib", "string"]


def test_normalize_cost_matrix():
    C = np.array([[2.0, 4.0], [6.0, 10.0]])
    N = normalize_cost_matrix(C)
    assert N.min() == 0.0 and N.max() == 1.0
    np.testing.assert_allclose(normalize_cost_matrix(np.ones((3, 3))), 0.0)
