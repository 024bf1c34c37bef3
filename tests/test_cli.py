"""CLI smoke tests (CPU-only paths)."""

import json

import numpy as np
import pytest

from lapgnn_tpu.cli import generate_dataset, main_benchmark, regenerate_assignments
from lapgnn_tpu.data.h5io import H5Reader

pytestmark = pytest.mark.slow  # end-to-end CLI smoke (subprocess + dataset + training, ~2 min)


def test_generate_dataset_cli(tmp_path):
    out = tmp_path / "ds"
    generate_dataset.main(
        [
            "--output", str(out),
            "--sizes", "12", "16",
            "--families", "uniform", "tie",
            "--instances", "5",
            "--split", "0.6", "0.4", "0.0",
            "--seed", "1",
        ]
    )
    with H5Reader(out / "train.h5") as r:
        assert len(r) == 12  # 2 sizes x 2 families x 3 train
        sizes = set(r.sizes().tolist())
        assert sizes == {12, 16}
        rec = r[0]
        assert rec["cost"].shape == (rec["n"], rec["n"])
    with H5Reader(out / "val.h5") as r:
        assert len(r) == 8


def test_regenerate_assignments_cli(tmp_path):
    out = tmp_path / "ds"
    generate_dataset.main(
        ["--output", str(out), "--sizes", "10", "--families", "uniform",
         "--instances", "4", "--split", "1.0", "0.0", "0.0"]
    )
    regenerate_assignments.main(
        ["--input", str(out / "train.h5"), "--output", str(out / "fixed.h5"),
         "--refresh-duals"]
    )
    with H5Reader(out / "fixed.h5") as r:
        assert len(r) == 4
        rec = r[0]
        # Regenerated assignment must be optimal with certified duals.
        red = rec["cost"] - rec["u"][:, None] - rec["v"][None, :]
        assert red.min() >= -1e-8


def test_main_benchmark_quick(tmp_path, capsys):
    main_benchmark.main(["--quick", "--logs", str(tmp_path / "logs")])
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
    assert any("mean_speedup_vs_scipy" in l for l in lines)
    groups = {l["group"] for l in lines if "group" in l}
    assert {"uniform", "near_diagonal", "sparse"} <= groups
    # Noise-sensitivity group present.
    assert any(g.startswith("uniform_noise") for g in groups)
    # Logs written.
    assert (tmp_path / "logs" / "experiments").exists()


def test_scaling_benchmark_cli(capsys):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple virtual devices")
    from lapgnn_tpu.cli import scaling_benchmark

    scaling_benchmark.main(
        ["--meshes", "1", "2", "--n", "128", "--batch", "1", "--repeats", "2",
         "--roofline-n", "128"]
    )
    out = capsys.readouterr().out
    data = json.loads(out.strip().splitlines()[-1])
    meshes = data["pipeline_edges_per_s_per_mesh"]
    assert "1" in meshes and meshes["1"]["scaling_efficiency"] == 1.0
    assert "128" in data["roofline"]
    assert data["roofline"]["128"]["min_trick_xla_gb_s"] > 0
