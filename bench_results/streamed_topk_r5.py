"""Round-5 large-n STREAMED posture measurement: topk16 transfer at
n in {4096, 8192, 16384}.

The round-4 large-scale numbers (large_scale_r4) are device-RESIDENT; the
streamed (host-holds-the-matrix) posture was only ever measured at n=2048
because a dense upload is transfer-bound (a 1 GB f32 matrix at 16K over
the ~50 MB/s dev tunnel is ~20 s — unusable).  The topk16 encoding makes
the streamed posture viable at every size: n*64*4 bytes = 4 MB at 16K
(256x fewer bytes), and the host-side argpartition pack (~2 s at 16K)
overlaps the stream on the pack worker.

Per size: SciPy baseline (1-3 reps — minutes each at 16K), then
solve_stream over the instances with certify=True; exactness asserted
per instance.  Writes streamed_topk_r5.json.

Run: python bench_results/streamed_topk_r5.py   (real TPU; the n=16384
program's first compile takes minutes — the persistent compile cache
makes reruns fast).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.optimize

SIZES = {4096: 4, 8192: 3, 16384: 2}  # n -> instances


def main() -> None:
    from lapgnn_tpu.data.generators import generate_uniform_costs
    from lapgnn_tpu.pipeline import WarmStartPipeline
    from lapgnn_tpu.train.checkpoint import build_model_from_meta, load_checkpoint

    params, meta, _ = load_checkpoint(
        Path(__file__).parent.parent / "artifacts" / "one_gnn_default"
    )
    model = build_model_from_meta(meta)
    use_refine = bool(meta.get("use_cost_refinement", True))

    out = {"transfer": "topk16 (k=64)", "sizes": {}}
    for n, n_inst in SIZES.items():
        stream = [
            np.asarray(generate_uniform_costs(n, seed=600 + k), np.float64)
            for k in range(n_inst)
        ]
        t0 = time.perf_counter()
        r0, c0 = scipy.optimize.linear_sum_assignment(stream[0])
        t_scipy = time.perf_counter() - t0
        opt0 = float(stream[0][r0, c0].sum())

        pipe = WarmStartPipeline(
            model, params, mode="device", use_cost_refinement=use_refine,
            transfer_dtype="topk16",
        )
        t0 = time.perf_counter()
        pipe.solve_stream(stream[:1], certify=True)  # compile + warm
        t_warm = time.perf_counter() - t0
        ts = []
        for _ in range(3 if n < 16384 else 2):
            t0 = time.perf_counter()
            outs = pipe.solve_stream(stream, certify=True)
            ts.append((time.perf_counter() - t0) / len(stream))
        t_inst = float(np.median(ts))
        # Exactness: instance 0 vs the SciPy optimum; all instances must
        # carry a passing f64 certificate (LP-duality proof of optimality).
        got0 = float(stream[0][np.arange(n), outs[0]["col_of_row"][0]].sum())
        assert outs[0]["certified"].all() and abs(got0 - opt0) <= 1e-9 * max(
            1.0, abs(opt0)
        ), (got0, opt0)
        assert all(o["certified"].all() for o in outs)
        n_pol = sum(int(o["polished"].any()) for o in outs)
        n_rep = sum(int(o["repaired"].all()) for o in outs)
        out["sizes"][n] = {
            "scipy_s": round(t_scipy, 2),
            "streamed_ms_per_instance": round(t_inst * 1e3, 1),
            "speedup_vs_scipy": round(t_scipy / t_inst, 2),
            "payload_mb": round(n * 64 * 4 / 2**20, 2),
            "dense_f32_mb": round(n * n * 4 / 2**20, 1),
            "warm_compile_s": round(t_warm, 1),
            "repaired": f"{n_rep}/{n_inst}",
            "polished": f"{n_pol}/{n_inst}",
            "reps": len(ts),
        }
        print(n, out["sizes"][n], flush=True)

    path = Path(__file__).parent / "streamed_topk_r5.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print("->", path, flush=True)


if __name__ == "__main__":
    main()
