"""Pipeline stage profiler.

Equivalent of ``ComprehensivePipelineProfiler.profile_pipeline``
(``/root/reference/scripts/analyze_all_types_pipeline.py:158-283``): brackets
each named stage of the warm-start pipeline with ``block_until_ready``
barriers (the TPU analogue of the reference's ``torch.cuda.synchronize``) and
aggregates per-stage milliseconds, GNN overhead, and total pipeline time.

Also exposes ``trace`` — a thin wrapper over ``jax.profiler`` for xprof-style
device traces of the jitted programs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

__all__ = ["StageProfiler", "profile_pipeline", "trace"]


class StageProfiler:
    """Collects named stage timings over repeated runs."""

    def __init__(self):
        self.stages: Dict[str, list] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        import jax

        t0 = time.perf_counter()
        box: Dict[str, Any] = {}
        try:
            yield box
        finally:
            if "out" in box:
                # Sync via a SCALAR D2H readback: on remote-attached
                # platforms block_until_ready can return early, and
                # materialising the full output would add a matrix-sized
                # D2H transfer INSIDE the timed region (~1 GB at n=16K).
                def _sync(leaf):
                    arr = jnp.asarray(leaf)
                    np.asarray(arr.ravel()[-1:]) if arr.size else None

                import jax.numpy as jnp

                jax.tree_util.tree_map(_sync, box["out"])
            self.stages.setdefault(name, []).append(time.perf_counter() - t0)

    def summary_ms(self) -> Dict[str, float]:
        return {k: float(np.median(v) * 1e3) for k, v in self.stages.items()}


def profile_pipeline(
    pipe,
    C: np.ndarray,
    repeats: int = 5,
) -> Dict[str, float]:
    """Per-stage breakdown of one warm-start solve.

    Stages (mirroring analyze_all_types_pipeline.py:158-283): data_to_device,
    feature_compute, gnn_inference, v_compute (min-trick), seeded_solve,
    validation; plus aggregates gnn_overhead_ms and total_pipeline_ms.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.dual import fast_min_trick, robust_normalize
    from ..ops.features import fast_row_features

    model, params = pipe.model, pipe.params

    # Profile the stages the PRODUCTION predict actually runs
    # (pipeline.predict_duals_fn): robust normalization, features on the
    # normalized cost, model with the pipe's refinement setting, affine
    # dual map-back, rank-1 candidate + selection under seed_mode='auto',
    # and the routed fast_min_trick — a raw-C re-implementation would time
    # out-of-distribution seeds the pipeline never produces.
    normalize = getattr(pipe, "seed_mode", "auto") != "rank1"
    use_cost = True

    @jax.jit
    def norm_fn(c):
        return robust_normalize(c)

    feats_fn = jax.jit(fast_row_features)
    apply_fn = jax.jit(
        lambda p, f, c: model.apply(p, f, cost=c)
    )
    mt_fn = jax.jit(fast_min_trick)

    from ..ops.rank1 import rank1_duals, select_best_seed

    @jax.jit
    def seed_select_fn(c, u):
        u_r1, _ = rank1_duals(c)
        return select_best_seed(c, (u, u_r1))

    prof = StageProfiler()
    C = np.asarray(C, np.float32)
    if C.ndim == 2:
        C = C[None]

    for _ in range(repeats + 1):  # first iteration warms up every stage
        with prof.stage("data_to_device") as box:
            Cd = jnp.asarray(C)
            box["out"] = Cd
        with prof.stage("normalize") as box:
            if normalize:
                C_in, mn, a = norm_fn(Cd)
            else:
                C_in, mn, a = Cd, None, None
            box["out"] = C_in
        with prof.stage("feature_compute") as box:
            feats = feats_fn(C_in)
            box["out"] = feats
        with prof.stage("gnn_inference") as box:
            preds = apply_fn(params, feats, C_in if use_cost else None)
            box["out"] = preds
        u = preds["u"].astype(Cd.dtype)
        if normalize:
            u = u * a[..., None] + mn[..., None]
        with prof.stage("v_compute") as box:
            if getattr(pipe, "seed_mode", "auto") == "auto":
                u, v = seed_select_fn(Cd, u)
            else:
                v = mt_fn(Cd, u)
            box["out"] = v
        with prof.stage("seeded_solve") as box:
            if pipe.mode == "device":
                res = pipe._solve(Cd, u, v)
                box["out"] = res.cost
                cost = np.asarray(res.cost)
                x = np.asarray(res.col_of_row)
            else:
                from ..solver.native import lapjv_seeded_native

                xs, costs = [], []
                for b in range(C.shape[0]):
                    xb, _, cb = lapjv_seeded_native(
                        np.asarray(C[b], np.float64),
                        np.asarray(u[b], np.float64),
                        np.asarray(v[b], np.float64),
                    )
                    xs.append(xb)
                    costs.append(cb)
                x, cost = np.stack(xs), np.asarray(costs)
        with prof.stage("validation"):
            for b in range(C.shape[0]):
                assert sorted(x[b].tolist()) == list(range(C.shape[-1]))

    # Drop the warmup sample from each stage.
    for k in prof.stages:
        prof.stages[k] = prof.stages[k][1:]

    out = prof.summary_ms()
    out["gnn_overhead_ms"] = (
        out.get("normalize", 0.0)
        + out.get("feature_compute", 0.0)
        + out.get("gnn_inference", 0.0)
        + out.get("v_compute", 0.0)
    )
    out["total_pipeline_ms"] = sum(
        v for k, v in out.items() if not k.endswith("_ms")
    )
    return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lapgnn_trace"):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
