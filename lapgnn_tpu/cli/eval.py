"""Model evaluation CLI (equivalent of /root/reference/gnn/eval.py:173-196).

Example:
  python -m lapgnn_tpu.cli.eval --checkpoint artifacts/one_gnn_default \
      --split data/mid512/val.h5 --limit 50
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--split", type=Path, required=True)
    p.add_argument("--limit", type=int, default=50)
    p.add_argument("--mode", choices=["device", "hybrid"], default="hybrid")
    p.add_argument(
        "--seed-mode", choices=["auto", "gnn", "rank1"], default="auto",
        help="dual-seed source: GNN, rank-1 analytic, or per-instance best (ops/rank1.py)",
    )
    p.add_argument("--no-timing", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..data.h5io import H5Reader
    from ..evaluation import evaluate_pipeline
    from ..pipeline import WarmStartPipeline
    from ..train.checkpoint import build_model_from_meta, load_checkpoint

    params, meta, _ = load_checkpoint(args.checkpoint)
    model = build_model_from_meta(meta)
    if meta.get("architecture") == "dual_gnn":
        # The reference's eval.py is DualGNN-oriented (gnn/eval.py:69-80);
        # DualGNN has its own feature/forward surface, so it cannot ride the
        # OneGNN WarmStartPipeline (a DualGNN checkpoint used to crash here
        # with "unexpected keyword argument 'cost'" — caught by the CLI
        # smoke tests).  u is served identically; v via the min-trick.
        from ..evaluation import DualGNNPredictor

        pipe = DualGNNPredictor(model, params, seed_mode=args.seed_mode)
    else:
        pipe = WarmStartPipeline(
            model,
            params,
            mode=args.mode,
            use_cost_refinement=bool(meta.get("use_cost_refinement", True)),
            seed_mode=args.seed_mode,
        )
    with H5Reader(args.split) as r:
        instances = [r[i] for i in range(min(len(r), args.limit))]
    metrics = evaluate_pipeline(pipe, instances, time_solvers=not args.no_timing)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
