"""Model evaluation: dual quality, assist rate, and solver speedup metrics.

Re-creates ``/root/reference/gnn/eval.py:83-170``.  Per instance:
  * predict (u, v) with the pipeline (min-trick guarantees feasibility),
  * dual feasibility check and u/v MSE+MAE vs oracle duals,
  * pre-solve greedy primal gap (eval.py:28-66,150-153),
  * wall-clock of cold native JV vs seeded native JV with the predicted
    duals -> speedup, and assist_rate = fraction of instances where the
    seeded result matches the optimal cost to <= 1e-6 (eval.py:159-170;
    with this solver design the assist rate is 1.0 by construction — the
    seeded solver is exact — so it doubles as a correctness assertion).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .ops.dual import check_dual_feasible
from .pipeline import WarmStartPipeline
from .train.loss import BIG, greedy_primal_upper

__all__ = ["evaluate_pipeline"]


class DualGNNPredictor:
    """Adapter exposing WarmStartPipeline's ``predict_duals`` surface for
    DualGNN so ``evaluation.evaluate_pipeline`` can score both models with
    the same code path (v from the min-trick, as gnn/eval.py:119 does —
    v_hint is a training aid, not the serving column dual).

    ``seed_mode`` mirrors the OneGNN pipeline's serving default: the rank-1
    analytic candidate (ops/rank1.py) is model-agnostic, so a fair
    model-vs-model ladder must give BOTH sides the same auto-selection —
    scoring DualGNN on raw GNN duals while OneGNN gets the per-instance
    best-of-two conflates the model gap with the seed-selection feature."""

    def __init__(self, model, params, seed_mode: str = "auto"):
        import jax

        from .ops.dual import min_trick_v
        from .ops.features import graph_features
        from .ops.rank1 import rank1_duals, select_best_seed

        if seed_mode not in ("gnn", "rank1", "auto"):
            raise ValueError("seed_mode must be 'gnn', 'rank1', or 'auto'")
        # Default matches WarmStartPipeline's serving default ('auto') so a
        # default-constructed predictor scores the same posture; also read
        # by evaluate_pipeline's rank1_seed_win_rate telemetry gate.
        self.seed_mode = seed_mode
        self.params = jax.device_put(params)

        @jax.jit
        def predict(params, cost):
            gf = graph_features(cost)
            preds = model.apply(
                params, gf.edge_feat, gf.row_feat, gf.col_feat, deterministic=True
            )
            u = preds["u"].astype(cost.dtype)
            if seed_mode == "rank1":
                u, _ = rank1_duals(cost)
            elif seed_mode == "auto":
                # Same 'auto' as the serving pipeline, by construction:
                # one shared policy implementation.
                from .ops.sinkhorn import auto_select_seed

                return auto_select_seed(cost, u, min_trick=min_trick_v)
            v = min_trick_v(cost, u)
            return u, v

        self._predict = predict

    def predict_duals(self, cost):
        return self._predict(self.params, cost)


def evaluate_pipeline(
    pipe: WarmStartPipeline,
    instances: Sequence[Dict[str, np.ndarray]],
    time_solvers: bool = True,
    repeats: int = 3,
) -> Dict[str, float]:
    """Evaluate over instance dicts with keys cost/u/v/opt_cost."""
    from .solver.native import lapjv_native, lapjv_seeded_native

    feasible = []
    u_mse, v_mse, u_mae, v_mae = [], [], [], []
    u_mae_gauge = []
    presolve_gap = []
    presolve_gap_clipped = []
    speedups = []
    assists = []
    fallbacks = []
    rank1_wins = []

    for inst in instances:
        C = np.asarray(inst["cost"], np.float64)
        n = C.shape[0]
        Cd = jnp.asarray(C, jnp.float32)[None]
        u_pred, v_pred = pipe.predict_duals(Cd)
        u_np = np.asarray(u_pred[0], np.float64)
        v_np = np.asarray(v_pred[0], np.float64)

        feasible.append(
            bool(
                check_dual_feasible(
                    jnp.asarray(C), jnp.asarray(u_np), jnp.asarray(v_np), tol=1e-5
                )
            )
        )
        u_star, v_star = np.asarray(inst["u"]), np.asarray(inst["v"])
        u_mse.append(float(np.mean((u_np - u_star) ** 2)))
        v_mse.append(float(np.mean((v_np - v_star) ** 2)))
        u_mae.append(float(np.mean(np.abs(u_np - u_star))))
        v_mae.append(float(np.mean(np.abs(v_np - v_star))))
        # Gauge-corrected: duals are defined up to a constant shift
        # (u+c, v-c); remove the mean offset before comparing shapes.
        du = u_np - u_star
        u_mae_gauge.append(float(np.mean(np.abs(du - du.mean()))))

        if getattr(pipe, "seed_mode", "gnn") == "auto":
            # Which candidate won the selection? The served u equals the
            # rank-1 analytic duals exactly when they won (select_best_seed
            # copies the winner verbatim).
            from .ops.rank1 import rank1_duals

            u_r1 = np.asarray(rank1_duals(Cd)[0][0], np.float64)
            # Scale-aware: the jitted pipeline and this eager recomputation
            # can differ by f32 fusion/reduction order, and rank-1 duals
            # scale like O(n) on noisy_linear.
            tol = 1e-4 * (1.0 + float(np.abs(u_r1).max()))
            rank1_wins.append(bool(np.allclose(u_np, u_r1, atol=tol)))

        red = C - u_np[:, None] - v_np[None, :]
        ub = float(
            greedy_primal_upper(jnp.asarray(C)[None], jnp.asarray(red)[None])[0]
        )
        opt = float(inst.get("opt_cost", ub))
        presolve_gap.append(ub - opt)
        # Sentinel-clipped twin (VERDICT r4 #4): on the sparse family the
        # raw greedy bound is sentinel-dominated (one forbidden-edge
        # collision adds ~1e6, drowning the seed-quality signal the metric
        # exists to track).  Clipping mirrors the training loss
        # (train/loss.clip_cost_sentinels); the optimal assignment avoids
        # sentinels whenever possible, so its cost — and hence the gap
        # zero point — is unchanged, and the clipped gap is a finite,
        # comparable seed-quality number for every family (identical to
        # the raw gap on sentinel-free families).
        # f64 NumPy clip (same rule as clip_cost_sentinels, threshold
        # 0.5*BIG): on sentinel-free families C_clip == C bitwise, so the
        # clipped bound is IDENTICAL to the raw one (a jnp round trip
        # would cast to f32 and let greedy tie-break chaos decorrelate
        # the two columns).
        finite = C < 0.5 * BIG
        if finite.all():
            presolve_gap_clipped.append(presolve_gap[-1])
        else:
            fmax = C[finite].max() if finite.any() else np.inf
            C_clip = np.minimum(C, fmax)
            red_clip = C_clip - u_np[:, None] - v_np[None, :]
            ub_clip = float(
                greedy_primal_upper(
                    jnp.asarray(C_clip)[None], jnp.asarray(red_clip)[None]
                )[0]
            )
            presolve_gap_clipped.append(ub_clip - opt)

        x, _, cost_seeded, info = lapjv_seeded_native(
            C, u_np, v_np, return_info=True, gate="both"
        )
        assists.append(abs(cost_seeded - opt) <= 1e-6 * max(1.0, abs(opt)))
        fallbacks.append(info["used_fallback"])

        if time_solvers:
            ts, tc = [], []
            for _ in range(repeats):
                t0 = time.perf_counter()
                lapjv_native(C)
                tc.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                lapjv_seeded_native(C, u_np, v_np, gate="both")
                ts.append(time.perf_counter() - t0)
            speedups.append(float(np.median(tc) / np.median(ts)))

    out = {
        "num_instances": len(instances),
        "feasible_rate": float(np.mean(feasible)),
        "assist_rate": float(np.mean(assists)),
        "fallback_rate": float(np.mean(fallbacks)),
        "u_mse": float(np.mean(u_mse)),
        "v_mse": float(np.mean(v_mse)),
        "u_mae": float(np.mean(u_mae)),
        "u_mae_gauge": float(np.mean(u_mae_gauge)),
        "v_mae": float(np.mean(v_mae)),
        "presolve_gap_mean": float(np.mean(presolve_gap)),
        "presolve_gap_median": float(np.median(presolve_gap)),
        # Sentinel-clipped gap: the trackable seed-quality number for the
        # sparse family (== raw gap on sentinel-free families).
        "presolve_gap_clipped_mean": float(np.mean(presolve_gap_clipped)),
        "presolve_gap_clipped_median": float(np.median(presolve_gap_clipped)),
        # Dispersion (VERDICT r4 #5): per-instance IQRs so ladder cells can
        # carry uncertainty; model-vs-model deltas smaller than these are
        # noise, not findings.
        "presolve_gap_clipped_iqr": [
            float(np.percentile(presolve_gap_clipped, 25)),
            float(np.percentile(presolve_gap_clipped, 75)),
        ],
        "u_mae_gauge_iqr": [
            float(np.percentile(u_mae_gauge, 25)),
            float(np.percentile(u_mae_gauge, 75)),
        ],
    }
    if rank1_wins:
        out["rank1_seed_win_rate"] = float(np.mean(rank1_wins))
    if speedups:
        out["seeded_vs_cold_speedup_mean"] = float(np.mean(speedups))
        out["seeded_vs_cold_speedup_median"] = float(np.median(speedups))
    return out
