"""End-to-end pipeline + evaluation + progressive-trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from lapgnn_tpu.data.generators import FAMILIES
from lapgnn_tpu.data.synthetic import generate_synthetic_instance
from lapgnn_tpu.models import OneGNN
from lapgnn_tpu.ops.features import row_features
from lapgnn_tpu.pipeline import WarmStartPipeline
from lapgnn_tpu.train.progressive import (
    DatasetSpec,
    RoundRobinSampler,
    default_batch_size,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = OneGNN(hidden=16, layers=1, topk=4)
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.uniform(0, 1, (1, 16, 16)), jnp.float32)
    params = model.init(jax.random.key(0), row_features(C), cost=C)
    return model, params


@pytest.mark.parametrize("mode", ["device", "hybrid"])
def test_pipeline_exact_optimality_untrained(tiny_model, mode, rng):
    """Even with an untrained model the pipeline must be exactly optimal
    (the solver's quality gate guarantees it)."""
    model, params = tiny_model
    pipe = WarmStartPipeline(model, params, mode=mode)
    C = np.stack([FAMILIES["uniform"](16, rng) for _ in range(2)])
    out = pipe.solve(C)
    for b in range(2):
        r, c = scipy.optimize.linear_sum_assignment(C[b])
        opt = C[b][r, c].sum()
        got = C[b][np.arange(16), out["col_of_row"][b]].sum()
        assert abs(got - opt) < 1e-4 * max(1, abs(opt))


def test_pipeline_duals_always_feasible(tiny_model, rng):
    model, params = tiny_model
    pipe = WarmStartPipeline(model, params)
    C = jnp.asarray(np.stack([FAMILIES["uniform"](16, rng)]), jnp.float32)
    u, v = pipe.predict_duals(C)
    red = np.asarray(C[0]) - np.asarray(u[0])[:, None] - np.asarray(v[0])[None, :]
    assert red.min() >= -1e-5


def test_solve_stream_matches_solve(tiny_model, rng):
    """Pipelined streaming path agrees with per-call solve and is optimal."""
    model, params = tiny_model
    pipe = WarmStartPipeline(model, params, mode="device")
    costs = [FAMILIES["uniform"](16, rng).astype(np.float32) for _ in range(4)]
    outs = pipe.solve_stream(costs)
    assert len(outs) == 4
    for C, out in zip(costs, outs):
        r, c = scipy.optimize.linear_sum_assignment(C.astype(np.float64))
        opt = C[r, c].sum()
        got = C[np.arange(16), out["col_of_row"][0]].sum()
        assert abs(got - opt) < 1e-4 * max(1, abs(opt))


@pytest.mark.parametrize("dtype", ["bfloat16", "float16"])
def test_lossy_transfer_certified_exact(tiny_model, rng, dtype):
    """bf16/f16 cost upload (half the bytes on a bandwidth-bound link) +
    certify=True must return the EXACT optimum of the true f64 matrix: the
    device solves the rounded problem, the host certificate fails against
    the true C, and the native f64 polish warm-started from the device duals
    repairs it.  Covers solve(), solve_stream(), and the hybrid mode (exact
    by construction — the native solve reads the true host matrix)."""
    model, params = tiny_model
    costs = [FAMILIES["uniform"](32, rng) for _ in range(3)]
    opts = []
    for C in costs:
        r, c = scipy.optimize.linear_sum_assignment(C)
        opts.append(C[r, c].sum())

    pipe = WarmStartPipeline(model, params, mode="device", transfer_dtype=dtype)
    out = pipe.solve(np.stack(costs), certify=True)
    assert out["certified"].all()
    for b, C in enumerate(costs):
        got = C[np.arange(32), out["col_of_row"][b]].sum()
        assert abs(got - opts[b]) < 1e-9
        assert abs(out["cost"][b] - opts[b]) < 1e-9

    streamed = pipe.solve_stream(costs, certify=True)
    for o, C, opt in zip(streamed, costs, opts):
        assert o["certified"].all()
        got = C[np.arange(32), o["col_of_row"][0]].sum()
        assert abs(got - opt) < 1e-9

    hyb = WarmStartPipeline(model, params, mode="hybrid", transfer_dtype=dtype)
    out_h = hyb.solve(np.stack(costs))
    for b, opt in enumerate(opts):
        assert abs(out_h["cost"][b] - opt) < 1e-9


def test_certify_reports_polish_telemetry(tiny_model, rng):
    """certify=True results carry 'polished'/'polish_ms' telemetry, and the
    gap_bound of a polished entry is the re-certified bound of the POLISHED
    result (not a hardcoded zero) — the advisor's round-2 finding."""
    model, params = tiny_model
    pipe = WarmStartPipeline(
        model, params, mode="device", transfer_dtype="bfloat16"
    )
    C = FAMILIES["uniform"](32, rng)
    out = pipe.solve(C[None], certify=True)
    for key in ("certified", "gap_bound", "polished", "polish_ms"):
        assert key in out, key
    assert out["certified"].all()
    if out["polished"][0]:
        # a polished entry's timing was measured, and its bound comes from a
        # real certificate (n * tight_eps at most, never silently huge)
        assert out["polish_ms"][0] > 0
        assert out["gap_bound"][0] <= 32 * pipe.certify_tol


def test_to_xfer_bf16_bit_identical_to_ml_dtypes(tiny_model, rng):
    """The fast host-side bf16 packing (uint bit ops, round-to-nearest-even)
    must be bit-identical to the ml_dtypes cast it replaces — the device
    solves exactly the matrix the slow path would have uploaded."""
    import ml_dtypes

    model, params = tiny_model
    pipe = WarmStartPipeline(
        model, params, mode="device", transfer_dtype="bfloat16"
    )
    for scale in (1.0, 1e6, 1e-6):
        a = rng.uniform(-scale, scale, (64, 64))
        ref = a.astype(np.float32).astype(ml_dtypes.bfloat16)
        got = pipe._to_xfer(a)
        assert got.dtype == ref.dtype
        assert (got.view(np.uint16) == ref.view(np.uint16)).all()


def test_transfer_dtype_validated(tiny_model):
    model, params = tiny_model
    with pytest.raises(ValueError):
        WarmStartPipeline(model, params, transfer_dtype="int8")
    with pytest.raises(ValueError):
        # fixed-point decode lives in the device e2e program only
        WarmStartPipeline(model, params, mode="hybrid", transfer_dtype="uint16")


def _decode_u16_np(enc):
    from lapgnn_tpu.pipeline import _decode_transfer

    return np.asarray(_decode_transfer({k: jnp.asarray(v) for k, v in enc.items()}))


def test_u16_quantizer_error_bounds(rng):
    """Two-segment uint16 fixed-point transfer code (round 5): bulk error
    bounded by step/2 (~250x finer than bf16 on [0,1] costs), sentinel
    entries survive on the tail grid instead of destroying the bulk
    precision, and degenerate inputs (constant, NaN) stay finite."""
    from lapgnn_tpu.pipeline import quantize_u16

    # [0,1]-range: the whole code range covers the data
    C = rng.uniform(0, 1, (96, 96))
    enc = quantize_u16(C)
    dec = _decode_u16_np(enc)[0]
    assert enc["step"][0] < 2e-5  # fine bulk grid
    assert np.abs(dec - C.astype(np.float32)).max() <= enc["step"][0] * 0.51 + 1e-7

    # forbidden-edge sentinels (70% of entries at 1e6, the sparse family's
    # worst case): bulk stays fine, sentinels decode to ~1e6 on the tail
    Cs = rng.uniform(0, 1, (96, 96))
    m = rng.uniform(0, 1, (96, 96)) < 0.7
    Cs[m] = 1e6
    enc = quantize_u16(Cs)
    dec = _decode_u16_np(enc)[0]
    assert enc["step"][0] < 5e-4  # one sentinel must not stretch the grid
    assert np.abs(dec[~m] - Cs[~m]).max() < 3e-4
    assert np.abs(dec[m] - 1e6).max() < 1e3

    # degenerate: constant matrix round-trips; NaN entries decode finite
    assert np.allclose(_decode_u16_np(quantize_u16(np.full((32, 32), 3.0)))[0], 3.0)
    Cn = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    Cn[3, 5] = np.nan
    assert np.isfinite(_decode_u16_np(quantize_u16(Cn))[0]).all()


def test_u16_transfer_certified_exact(tiny_model, rng):
    """uint16 fixed-point upload + certify=True returns the EXACT optimum
    of the true f64 matrix for solve() and solve_stream() — the round-5
    streamed-posture encoding (same bytes as bf16, fine enough that the
    device assignment survives quantization and the warm dual repair
    certifies without a native re-solve)."""
    model, params = tiny_model
    costs = [FAMILIES["uniform"](32, rng) for _ in range(3)]
    opts = []
    for C in costs:
        r, c = scipy.optimize.linear_sum_assignment(C)
        opts.append(C[r, c].sum())

    pipe = WarmStartPipeline(
        model, params, mode="device", transfer_dtype="uint16"
    )
    out = pipe.solve(np.stack(costs), certify=True)
    assert out["certified"].all()
    for b, C in enumerate(costs):
        got = C[np.arange(32), out["col_of_row"][b]].sum()
        assert abs(got - opts[b]) < 1e-9
        assert abs(out["cost"][b] - opts[b]) < 1e-9

    streamed = pipe.solve_stream(costs, certify=True)
    for o, C, opt in zip(streamed, costs, opts):
        assert o["certified"].all()
        got = C[np.arange(32), o["col_of_row"][0]].sum()
        assert abs(got - opt) < 1e-9

    # device-resident input bypasses quantization (already past the link)
    out_res = pipe.solve(jnp.asarray(costs[0], jnp.float32))
    assert sorted(out_res["col_of_row"][0].tolist()) == list(range(32))


def test_topk16_transfer_certified_exact(tiny_model, rng):
    """topk16 row-sparsified upload (n*k entries instead of n^2; the round-5
    streamed workhorse) + certify=True returns the EXACT optimum of the true
    f64 matrix for solve() and solve_stream()."""
    model, params = tiny_model
    costs = [FAMILIES["uniform"](48, rng) for _ in range(3)]
    opts = []
    for C in costs:
        r, c = scipy.optimize.linear_sum_assignment(C)
        opts.append(C[r, c].sum())

    pipe = WarmStartPipeline(
        model, params, mode="device", transfer_dtype="topk16", transfer_topk=16
    )
    out = pipe.solve(np.stack(costs), certify=True)
    assert out["certified"].all()
    for b, C in enumerate(costs):
        got = C[np.arange(48), out["col_of_row"][b]].sum()
        assert abs(got - opts[b]) < 1e-9
        assert abs(out["cost"][b] - opts[b]) < 1e-9

    streamed = pipe.solve_stream(costs, certify=True)
    for o, C, opt in zip(streamed, costs, opts):
        assert o["certified"].all()
        assert abs(C[np.arange(48), o["col_of_row"][0]].sum() - opt) < 1e-9


def test_topk16_quantizer_properties(rng):
    """Kept entries decode within step/2; fill sits strictly above every
    kept value so decoded row minima are always real entries."""
    from lapgnn_tpu.pipeline import quantize_topk16

    C = rng.uniform(0, 1, (64, 64))
    enc = quantize_topk16(C, 12)
    d = _decode_u16_np(enc)[0]
    for i in range(64):
        idx = enc["qi"][0, i].astype(int)
        true = C[i, idx].astype(np.float32)
        assert np.abs(d[i, idx] - true).max() <= enc["step"][0] * 0.51 + 1e-7
        assert enc["fill"][0] > true.max()
        # decoded row argmin is one of the kept columns
        assert d[i].argmin() in idx


def test_topk16_monge_family_polish_path(tiny_model, rng):
    """noisy_linear's Monge structure puts optimal edges OUTSIDE the
    row-top-k (documented family boundary of the topk16 encoding): the
    certify path must detect the miss and restore the exact optimum via
    the host polish — correctness never depends on the encoding."""
    model, params = tiny_model
    C = FAMILIES["noisy_linear"](48, rng)
    r, c = scipy.optimize.linear_sum_assignment(C)
    opt = C[r, c].sum()
    pipe = WarmStartPipeline(
        model, params, mode="device", transfer_dtype="topk16", transfer_topk=4
    )
    out = pipe.solve(C, certify=True)
    assert out["certified"].all()
    got = C[np.arange(48), out["col_of_row"][0]].sum()
    assert abs(got - opt) < 1e-9
    assert abs(out["cost"][0] - opt) < 1e-9


def test_solve_stream_microbatch(tiny_model, rng):
    """microbatch>1 groups consecutive instances into one device dispatch
    (amortising the per-call RTT at small n) while still returning one
    certified-exact dict per instance — including a ragged final chunk."""
    model, params = tiny_model
    pipe = WarmStartPipeline(
        model, params, mode="device", transfer_dtype="topk16", transfer_topk=8
    )
    costs = [FAMILIES["uniform"](24, rng) for _ in range(5)]
    outs = pipe.solve_stream(costs, certify=True, microbatch=2)
    assert len(outs) == 5
    for C, o in zip(costs, outs):
        r, c = scipy.optimize.linear_sum_assignment(C)
        assert o["certified"].all()
        got = C[np.arange(24), o["col_of_row"][0]].sum()
        assert abs(got - C[r, c].sum()) < 1e-9


def test_small_n_host_route(tiny_model, rng):
    """Size-routed serving: route='host' solves on the host backend (native
    cold JV below route_native_max_n, SciPy above), exact by construction,
    flagged via 'routed_host'.  On the CPU backend route='auto' must NOT
    route (there is no transfer floor; device paths stay exercised)."""
    model, params = tiny_model
    C = FAMILIES["uniform"](40, rng)
    r, c = scipy.optimize.linear_sum_assignment(C)
    opt = C[r, c].sum()

    pipe = WarmStartPipeline(model, params, mode="device", route="host")
    out = pipe.solve(C, certify=True)
    assert out["routed_host"].all() and out["certified"].all()
    assert abs(out["cost"][0] - opt) < 1e-9

    # SciPy-delegation branch
    pipe2 = WarmStartPipeline(
        model, params, mode="device", route="host", route_native_max_n=8
    )
    out2 = pipe2.solve(C)
    assert abs(out2["cost"][0] - opt) < 1e-9

    # auto on CPU: no routing
    pipe3 = WarmStartPipeline(model, params, mode="device", route="auto")
    out3 = pipe3.solve(C.astype(np.float32))
    assert "routed_host" not in out3

    with pytest.raises(ValueError):
        WarmStartPipeline(model, params, route="sideways")


def test_evaluation_metrics(tiny_model):
    model, params = tiny_model
    pipe = WarmStartPipeline(model, params, mode="hybrid")
    rng = np.random.default_rng(1)
    insts = []
    for _ in range(3):
        s = generate_synthetic_instance("uniform", 16, rng)
        insts.append(
            {
                "cost": s.cost,
                "u": s.u,
                "v": s.v,
                "opt_cost": float(s.cost[s.rows, s.cols].sum()),
            }
        )
    from lapgnn_tpu.evaluation import evaluate_pipeline

    m = evaluate_pipeline(pipe, insts, time_solvers=False)
    assert m["assist_rate"] == 1.0  # exactness by construction
    assert m["feasible_rate"] == 1.0
    assert np.isfinite(m["u_mse"])


def test_default_batch_size_rules():
    assert default_batch_size(512) == 32
    assert default_batch_size(1024) == 32
    assert default_batch_size(2048) == 16
    assert default_batch_size(4096) == 8
    assert default_batch_size(8192) == 4


def _mk_spec(name, size, count, start, rng):
    insts = [
        {"cost": FAMILIES["uniform"](size, rng), "u": np.zeros(size)}
        for _ in range(count)
    ]
    return DatasetSpec(
        name=name, size=size, instances=insts, curriculum_start_epoch=start
    )


def test_round_robin_sampler_curriculum(rng):
    specs = [
        _mk_spec("a", 8, 10, 0, rng),
        _mk_spec("b", 16, 10, 2, rng),
    ]
    sampler = RoundRobinSampler(specs, batches_per_size=2, seed=0)

    sampler.set_epoch(0)
    names0 = {spec.name for spec, _, _ in sampler}
    assert names0 == {"a"}  # b is gated by curriculum_start_epoch

    sampler.set_epoch(2)
    names2 = {spec.name for spec, _, _ in sampler}
    assert names2 == {"a", "b"}


def test_round_robin_sampler_covers_all_instances(rng):
    specs = [_mk_spec("a", 8, 7, 0, rng)]
    sampler = RoundRobinSampler(specs, batches_per_size=2, seed=0)
    sampler.set_epoch(0)
    total = sum(batch_cost.shape[0] for _, batch_cost, _ in sampler)
    assert total == 7


def test_round_robin_batches_are_size_homogeneous(rng):
    specs = [
        _mk_spec("a", 8, 5, 0, rng),
        _mk_spec("b", 16, 5, 0, rng),
    ]
    sampler = RoundRobinSampler(specs, batches_per_size=1, seed=0)
    sampler.set_epoch(0)
    for spec, cost, u in sampler:
        assert cost.shape[1] == cost.shape[2] == spec.size


def test_round_robin_duplicate_names_keep_separate_queues(rng):
    """Two specs sharing a YAML name must not share a batch queue (one would
    silently never train, or index out of the other's instance list)."""
    specs = [
        _mk_spec("same", 8, 6, 0, rng),
        _mk_spec("same", 16, 4, 0, rng),
    ]
    sampler = RoundRobinSampler(specs, batches_per_size=8, seed=0)
    sampler.set_epoch(0)
    sizes_seen = {c.shape[-1] for _, c, _ in sampler}
    assert sizes_seen == {8, 16}


def test_round_robin_reshuffles_exhausted_minor_dataset(rng):
    """Epoch is paced by the largest dataset; smaller ones reshuffle on
    exhaust so the mixture holds through the epoch tail."""
    big = _mk_spec("big", 8, 40, 0, rng)
    small = _mk_spec("small", 16, 2, 0, rng)
    sampler = RoundRobinSampler(
        specs=[big, small], batches_per_size=1,
        batch_size_rules=[(10**9, 2)], seed=0,
    )
    sampler.set_epoch(0)
    rounds = [spec.name for spec, _, _ in sampler]
    # small appears throughout, not only in the first cycle
    last_small = max(i for i, nm in enumerate(rounds) if nm == "small")
    assert last_small > len(rounds) // 2
    # and the big dataset paces the epoch: all 40 of its instances appear
    assert sum(1 for nm in rounds if nm == "big") == 20  # 40 inst / bs 2


def test_round_robin_weight_oversamples(rng):
    """DatasetSpec.weight scales the per-turn batch count (was a silently
    dead config knob)."""
    a = _mk_spec("a", 8, 40, 0, rng)
    heavy = DatasetSpec(
        name="h", size=16, instances=_mk_spec("x", 16, 40, 0, rng).instances,
        weight=3.0, curriculum_start_epoch=0,
    )
    sampler = RoundRobinSampler(
        [a, heavy], batches_per_size=1, batch_size_rules=[(10**9, 2)], seed=0
    )
    sampler.set_epoch(0)
    rounds = [spec.name for spec, _, _ in sampler]
    # each cycle: 1 batch of a, 3 of heavy
    assert rounds[:8] == ["a", "h", "h", "h", "a", "h", "h", "h"]
