"""Sparse-family device-vs-host solver measurement (VERDICT r3 #8 stretch).

Times, on the real chip: (a) the dense device seeded solve (sentinels stay
finite 1e6 entries), (b) the host native lapmod CSR solve, (c) the host
dense seeded solve — on sparse-family instances at n in {4096, 8192}, GNN
pipeline seeds, exactness asserted.  Run:
  python bench_results/sparse_device_measure.py
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import lapgnn_tpu  # noqa: F401
import numpy as np
import jax.numpy as jnp

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.pipeline import WarmStartPipeline
from lapgnn_tpu.train.checkpoint import load_checkpoint, build_model_from_meta
from lapgnn_tpu.solver.native import lapmod_native, sparse_from_dense, lapjv_native

params, meta, _ = load_checkpoint("artifacts/one_gnn_default")
model = build_model_from_meta(meta)
pipe = WarmStartPipeline(model, params)

out = {}
for n in (4096, 8192):
    C = FAMILIES["sparse"](n, np.random.default_rng(3))
    Cd = jnp.asarray(C, jnp.float32)[None]

    # (a) device pipeline (predict + solve, resident posture)
    res = pipe.solve(Cd)  # warmup/compile
    t0 = time.perf_counter(); res = pipe.solve(Cd); t_dev = time.perf_counter() - t0
    x = res["col_of_row"][0]
    got_dev = float(C[np.arange(n), x].sum())

    # (b) host lapmod CSR
    row_ptr, col_idx, vals = sparse_from_dense(C, 1e5)
    t0 = time.perf_counter()
    xm, _, cm = lapmod_native(n, row_ptr, col_idx, vals)
    t_mod = time.perf_counter() - t0

    # (c) host dense cold
    t0 = time.perf_counter(); _, _, cd = lapjv_native(C); t_cold = time.perf_counter() - t0

    assert abs(got_dev - cd) <= 1e-6 * max(1, abs(cd)), (got_dev, cd)
    assert abs(cm - cd) <= 1e-6 * max(1, abs(cd)), (cm, cd)
    out[n] = dict(device_ms=round(t_dev * 1e3, 1), lapmod_ms=round(t_mod * 1e3, 1),
                  host_dense_ms=round(t_cold * 1e3, 1))
    print(n, out[n], flush=True)

import json
print(json.dumps({"sparse_family_solver_comparison": out}))
