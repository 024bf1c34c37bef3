"""DualGNN training CLI (equivalent of /root/reference/gnn/train.py:311-419).

Example:
  python -m lapgnn_tpu.cli.train_dual_gnn --train data/mid512/train.h5 \
      --val data/mid512/val.h5 --epochs 10 --output artifacts/dual_gnn
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train", type=Path, required=True, nargs="+")
    p.add_argument("--val", type=Path, nargs="*", default=[])
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--min-epochs", type=int, default=5)
    p.add_argument("--patience", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--raw-reference-loss", action="store_true",
        help="train with the reference's unclipped, unnormalised, "
             "unsupervised loss (sparse-family 1e6 sentinels then dominate "
             "the gradient and the oracle-dual u-MSE term is dropped; see "
             "train/loss.dual_gnn_loss)",
    )
    p.add_argument(
        "--init-checkpoint", type=Path, default=None,
        help="warm-start (fine-tune) from an existing dual_gnn checkpoint",
    )
    p.add_argument(
        "--mesh-2d", default=None, metavar="ROWxCOL",
        help="train over a 2-D edge-partitioned device mesh, e.g. '4x2' "
             "(or 'auto' for the squarest factorisation of all devices) — "
             "lifts the single-device n<=2048 DualGNN memory cap by tiling "
             "every (B, n, n, hidden) edge tensor across devices "
             "(parallel/dual.py)",
    )
    p.add_argument("--output", type=Path, required=True)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..data.h5io import H5Reader
    from ..train.checkpoint import save_checkpoint
    from ..train.dual_trainer import DualTrainConfig, train_dual_gnn

    def load_all(paths):
        out = []
        for path in paths:
            with H5Reader(path) as r:
                out.extend(list(r.iter()))
        return out

    train_insts = load_all(args.train)
    val_insts = load_all(args.val) if args.val else None
    print(f"train: {len(train_insts)} val: {len(val_insts or [])}")

    cfg = DualTrainConfig(
        hidden=args.hidden,
        layers=args.layers,
        heads=args.heads,
        dropout=args.dropout,
        lr=args.lr,
        epochs=args.epochs,
        batch_size=args.batch_size,
        min_epochs=args.min_epochs,
        patience=args.patience,
        seed=args.seed,
        clip_sentinels=not args.raw_reference_loss,
        normalize_gap=not args.raw_reference_loss,
        supervise_duals=not args.raw_reference_loss,
    )
    mesh = None
    if args.mesh_2d:
        from ..parallel.dual import dual_mesh

        if args.mesh_2d == "auto":
            mesh = dual_mesh()
        else:
            row, _, col = args.mesh_2d.partition("x")
            mesh = dual_mesh(row=int(row), col=int(col))
        print(f"2-D edge-partitioned training on mesh {dict(mesh.shape)}")

    init_params = None
    if args.init_checkpoint:
        from ..train.checkpoint import load_checkpoint

        init_params, _, _ = load_checkpoint(args.init_checkpoint)
        print(f"warm init from {args.init_checkpoint}")

    params, history = train_dual_gnn(
        train_insts, val_insts, cfg, mesh=mesh, init_params=init_params
    )
    save_checkpoint(
        args.output,
        params,
        {
            "architecture": "dual_gnn",
            "hidden": args.hidden,
            "layers": args.layers,
            "heads": args.heads,
            "dropout": args.dropout,
            "node_feat_dim": 14,
            "edge_feat_dim": 10,
            "history": history,
        },
    )
    print(f"saved checkpoint to {args.output}")


if __name__ == "__main__":
    main()
