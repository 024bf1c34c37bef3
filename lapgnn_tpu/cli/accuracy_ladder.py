"""OneGNN-vs-DualGNN accuracy ladder (per-family and aggregate).

The reference positions DualGNN as the accuracy gold standard and OneGNN as
the ~10x-faster production model at ~90% of its accuracy
(ARCHITECTURE_OVERVIEW.md:52,209-214; dual_gnn.py:146-204) but never commits
a side-by-side table; this CLI produces it: u/v MAE (gauge-corrected), dual
feasibility, pre-solve gap, assist rate, and fallback rate for each model on
shared evaluation instances, grouped by cost family.

Example:
  python -m lapgnn_tpu.cli.accuracy_ladder \
      --one-gnn artifacts/progressive_r2/best --dual-gnn artifacts/dual_gnn_r2 \
      --split data/mixed_512_r2/val.h5 --limit 40 --output logs/accuracy_ladder.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np



def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--one-gnn", type=Path, required=True)
    p.add_argument("--dual-gnn", type=Path, default=None)
    p.add_argument("--split", type=Path, nargs="+", required=True)
    p.add_argument("--limit", type=int, default=40)
    p.add_argument("--per-family", action="store_true", default=True)
    p.add_argument(
        "--seed-mode", choices=["auto", "gnn", "rank1"], default="auto",
        help="dual-seed source for BOTH models' serving posture: GNN, "
             "rank-1 analytic, or per-instance best (ops/rank1.py)",
    )
    p.add_argument("--output", type=Path, default=None)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..data.h5io import H5Reader
    from ..evaluation import DualGNNPredictor, evaluate_pipeline
    from ..pipeline import WarmStartPipeline
    from ..train.checkpoint import build_model_from_meta, load_checkpoint

    instances = []
    for split in args.split:
        with H5Reader(split) as r:
            instances.extend(r[i] for i in range(len(r)))
    instances = instances[: args.limit * 8]

    by_family = {}
    for inst in instances:
        fam = str(inst.get("family", "unknown"))
        by_family.setdefault(fam, []).append(inst)
    for fam in by_family:
        by_family[fam] = by_family[fam][: args.limit]

    models = {}
    params, meta, _ = load_checkpoint(args.one_gnn)
    one = build_model_from_meta(meta)
    models["one_gnn"] = WarmStartPipeline(
        one, params, mode="hybrid",
        use_cost_refinement=bool(meta.get("use_cost_refinement", True)),
        seed_mode=args.seed_mode,
    )
    if args.dual_gnn:
        dparams, dmeta, _ = load_checkpoint(args.dual_gnn)
        dual = build_model_from_meta(dmeta)
        models["dual_gnn"] = DualGNNPredictor(
            dual, dparams, seed_mode=args.seed_mode
        )

    ladder = {}
    for name, pipe in models.items():
        ladder[name] = {"overall": {}, "per_family": {}}
        agg = []
        for fam, insts in sorted(by_family.items()):
            m = evaluate_pipeline(pipe, insts, time_solvers=False)
            ladder[name]["per_family"][fam] = m
            agg.append(m)
            iqr = m["presolve_gap_clipped_iqr"]
            print(
                f"{name} {fam}: u_mae_gauge={m['u_mae_gauge']:.5f} "
                f"presolve_gap_med={m['presolve_gap_median']:.4f} "
                f"clipped_gap_med={m['presolve_gap_clipped_median']:.4f} "
                f"IQR=[{iqr[0]:.3f},{iqr[1]:.3f}] "
                f"assist={m['assist_rate']:.2f} fallback={m['fallback_rate']:.2f}"
            )
        keys = ["u_mae", "u_mae_gauge", "v_mae", "feasible_rate", "assist_rate",
                "fallback_rate", "presolve_gap_median",
                "presolve_gap_clipped_median"]
        ladder[name]["overall"] = {
            k: float(np.mean([m[k] for m in agg])) for k in keys
        }
        print(f"{name} overall: {json.dumps(ladder[name]['overall'])}")

    line = json.dumps(ladder, indent=2)
    if args.output:
        args.output.parent.mkdir(parents=True, exist_ok=True)
        args.output.write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
