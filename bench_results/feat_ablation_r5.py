"""Round-5 feature-stage ablation (VERDICT r4 #8): measure what the
sort-dependent row-feature channels actually cost and buy at serving time.

The 21-D row features (ops/features.row_features, reference
gnn/features.py:161-243) contain six channels that need a per-row sort or
selection — MAD, second-best gap, competition, k-smallest mean/std,
difficulty (channels 4, 6-10) — and seven single-pass channels (min, max,
mean, std, entropy, near-best density, is-col-best) plus 8 positional
channels.  The sort is the expensive part of the feature stage; the
question is whether the serving path still needs it now that the 'auto'
seed frequently serves the Sinkhorn-refined or rank-1 candidate anyway.

Two measurements per size (resident posture, K-differenced):
  * e2e device latency of the FULL pipeline (features -> OneGNN ->
    auto-seed -> seeded solve) with the full 21-D features vs. a variant
    that skips the sort and feeds zeros for channels 4, 6-10 (the model
    keeps its trained weights; zeros are in-distribution only insofar as
    the channels are standardized -- this measures the ceiling of the
    speed win, and the quality harm).
  * seed quality of both variants (pre-solve clipped greedy gap + gauge
    u-MAE via evaluation.evaluate_pipeline) on shared n=512 instances.

Accept/reject: drop the sort channels only if the e2e win is material
(> 5% of pipeline latency) AND quality is not degraded.  Result JSON:
bench_results/feat_ablation_r5.json.

Run:  python bench_results/feat_ablation_r5.py   (real TPU; ~3 min)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SORT_CHANNELS = (4, 6, 7, 8, 9, 10)  # MAD, gap, competition, k10 mean/std, difficulty


def nosort_row_features(C: jnp.ndarray) -> jnp.ndarray:
    """21-D feature tensor with the sort-dependent channels zeroed AND the
    sort itself skipped (single-pass channels + positional encodings only)."""
    from lapgnn_tpu.ops.features import EPS, POS_FREQS, _entropy, positional_encodings

    squeeze = C.ndim == 2
    if squeeze:
        C = C[None]
    B, n, m = C.shape
    Cf = C.astype(jnp.float32)
    row_min = jnp.min(Cf, axis=-1)
    row_max = jnp.max(Cf, axis=-1)
    row_mean = jnp.mean(Cf, axis=-1)
    row_std = jnp.std(Cf, axis=-1)
    row_entropy = _entropy(Cf, axis=-1)
    near_best = jnp.mean(
        (Cf <= row_min[..., None] * 1.1).astype(jnp.float32), axis=-1
    )
    col_min = jnp.min(Cf, axis=-2)
    is_col_best = (
        jnp.sum((Cf == col_min[..., None, :]).astype(jnp.float32), axis=-1) / m
    )
    zero = jnp.zeros_like(row_min)
    pos = jnp.broadcast_to(positional_encodings(n), (B, n, 2 * len(POS_FREQS)))
    feat = jnp.concatenate(
        [
            jnp.stack(
                [row_min, row_max, row_mean, row_std, zero, row_entropy,
                 zero, zero, zero, zero, zero, near_best, is_col_best],
                axis=-1,
            ),
            pos,
        ],
        axis=-1,
    )
    return feat[0] if squeeze else feat


def build_predict(model, use_refine: bool, features_fn):
    """Mirror of pipeline.predict_duals_fn's normalize+auto path with a
    pluggable feature function (pipeline.py:predict_duals_fn)."""
    from lapgnn_tpu.ops.dual import fast_min_trick, robust_normalize
    from lapgnn_tpu.ops.sinkhorn import auto_select_seed

    @jax.jit
    def predict(params, cost):
        cost_in, mn, a = robust_normalize(cost)
        feats = features_fn(cost_in)
        preds = model.apply(
            params, feats, cost=cost_in if use_refine else None
        )
        u = preds["u"].astype(cost.dtype)
        u = u * a[..., None] + mn[..., None]
        return auto_select_seed(cost, u)

    return predict


def build_e2e(predict):
    from lapgnn_tpu.solver.seeded import lapjv_seeded_single

    @jax.jit
    def e2e(params, cost):
        u, v = predict(params, cost)
        res = lapjv_seeded_single(cost[0], u[0], v[0], gate="both")
        return jnp.concatenate(
            [res.cost[None].astype(jnp.float32),
             res.col_of_row.astype(jnp.float32)]
        )

    return e2e


def kdiff_ms(fn, params, Cd, K=8) -> float:
    def fold(k):
        out = None
        for _ in range(k):
            out = fn(params, Cd)
        np.asarray(out)

    fold(2)
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fold(K)
        t1 = time.perf_counter()
        fold(2 * K)
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / K)
    return float(np.median(diffs)) * 1e3


class _PredictorShim:
    def __init__(self, predict, params):
        self._predict, self.params = predict, params
        self.seed_mode = "auto"

    def predict_duals(self, cost):
        return self._predict(self.params, cost)


def main() -> None:
    from lapgnn_tpu.data.generators import generate_uniform_costs
    from lapgnn_tpu.data.synthetic import generate_synthetic_instance
    from lapgnn_tpu.evaluation import evaluate_pipeline
    from lapgnn_tpu.ops.features import fast_row_features
    from lapgnn_tpu.train.checkpoint import build_model_from_meta, load_checkpoint

    params, meta, _ = load_checkpoint(
        Path(__file__).parent.parent / "artifacts" / "one_gnn_default"
    )
    model = build_model_from_meta(meta)
    use_refine = bool(meta.get("use_cost_refinement", True))

    p_full = build_predict(model, use_refine, fast_row_features)
    p_nosort = build_predict(model, use_refine, nosort_row_features)
    e_full, e_nosort = build_e2e(p_full), build_e2e(p_nosort)

    out = {"device": str(jax.devices()[0]), "sizes": {}}
    for n in (2048, 4096):
        Cd = jnp.asarray(
            generate_uniform_costs(n, seed=31), jnp.float32
        )[None]
        t_full = kdiff_ms(e_full, params, Cd)
        t_nosort = kdiff_ms(e_nosort, params, Cd)
        # Feature-stage-only timing for attribution.
        f_full = jax.jit(lambda p, c: fast_row_features(c))
        f_nosort = jax.jit(lambda p, c: nosort_row_features(c))
        tf_full = kdiff_ms(f_full, params, Cd, K=32)
        tf_nosort = kdiff_ms(f_nosort, params, Cd, K=32)
        out["sizes"][n] = {
            "e2e_full_ms": round(t_full, 2),
            "e2e_nosort_ms": round(t_nosort, 2),
            "e2e_delta_pct": round(100 * (t_full - t_nosort) / t_full, 1),
            "features_full_ms": round(tf_full, 3),
            "features_nosort_ms": round(tf_nosort, 3),
        }
        print(n, out["sizes"][n], flush=True)

    # Seed quality on shared instances (n=512, three families where the
    # GNN seed actually serves: uniform/tie/metric; rank-1 families are
    # model-independent by construction).
    rng = np.random.default_rng(5)
    qual = {}
    for fam in ("uniform", "tie", "metric"):
        insts = []
        for _ in range(16):
            si = generate_synthetic_instance(fam, 512, rng)
            opt = float(
                si.cost[np.asarray(si.rows), np.asarray(si.cols)].sum()
            )
            insts.append(
                {"cost": si.cost, "u": si.u, "v": si.v, "opt_cost": opt}
            )
        m_full = evaluate_pipeline(
            _PredictorShim(p_full, params), insts, time_solvers=False
        )
        m_nosort = evaluate_pipeline(
            _PredictorShim(p_nosort, params), insts, time_solvers=False
        )
        qual[fam] = {
            "full": {
                "gap_med": m_full["presolve_gap_clipped_median"],
                "u_mae_gauge": m_full["u_mae_gauge"],
            },
            "nosort": {
                "gap_med": m_nosort["presolve_gap_clipped_median"],
                "u_mae_gauge": m_nosort["u_mae_gauge"],
            },
        }
        print(fam, qual[fam], flush=True)
    out["quality_n512"] = qual

    deltas = [out["sizes"][n]["e2e_delta_pct"] for n in out["sizes"]]
    worse = any(
        qual[f]["nosort"]["gap_med"] > 1.25 * qual[f]["full"]["gap_med"] + 0.5
        for f in qual
    )
    out["verdict"] = (
        "accept" if max(deltas) > 5.0 and not worse else "reject"
    )
    out["verdict_rationale"] = (
        f"max e2e win {max(deltas):.1f}% across sizes; quality degraded: "
        f"{worse}. Drop sort channels only if win > 5% AND no quality harm."
    )
    path = Path(__file__).parent / "feat_ablation_r5.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print("verdict:", out["verdict"], "->", path, flush=True)


if __name__ == "__main__":
    main()
