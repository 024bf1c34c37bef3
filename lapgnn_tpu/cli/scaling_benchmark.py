"""Edges/s scaling benchmark over mesh sizes (the north-star metric).

Measures the row-sharded predict pipeline's throughput in edges/s (edges =
n^2 cost-matrix entries processed per instance) across mesh configurations,
reporting scaling efficiency vs the single-device rate.  On a real pod slice
the mesh axes map onto ICI; in development, run on the virtual CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m lapgnn_tpu.cli.scaling_benchmark --meshes 1 2 4 8 --n 1024

Also reports the fused min-trick kernel's standalone bandwidth (GB/s) as the
SpMM-style roofline proxy for this workload (the pipeline is reduction-bound,
not matmul-bound: its hot op streams C once per reduction).
"""

from __future__ import annotations

import argparse
import json
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--meshes", type=int, nargs="+", default=[1, 2, 4, 8],
                   help="number of devices along the 'model' (row) axis")
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--repeats", type=int, default=5)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.generators import generate_uniform_costs
    from ..models import OneGNN
    from ..ops.features import row_features
    from ..parallel import make_mesh, make_sharded_predict

    n, B = args.n, args.batch
    edges = B * n * n
    C = np.stack(
        [generate_uniform_costs(n, seed=k) for k in range(B)]
    ).astype(np.float32)

    model = OneGNN(hidden=64, layers=2)
    Cd = jnp.asarray(C)
    params = model.init(jax.random.key(0), row_features(Cd), cost=Cd)

    results = {}
    base_rate = None
    n_dev = len(jax.devices())
    for m in args.meshes:
        if m > n_dev or n % m != 0:
            print(f"# skip mesh model={m} (devices={n_dev}, n%m={n % m})")
            continue
        mesh = make_mesh(data=1, model=m)
        predict = make_sharded_predict(model, mesh)
        with mesh:
            u, v = predict(params, Cd)
            np.asarray(v)  # true sync
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                u, v = predict(params, Cd)
                np.asarray(v)
                ts.append(time.perf_counter() - t0)
        rate = edges / min(ts)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * m)
        results[m] = {
            "edges_per_s": rate,
            "scaling_efficiency": round(eff, 4),
            "time_ms": round(min(ts) * 1e3, 2),
        }
        print(f"mesh model={m}: {rate/1e9:.3f} Gedges/s efficiency={eff:.2%}")

    # Fused min-trick bandwidth (roofline proxy).
    from ..ops.pallas import pallas_min_trick

    C1 = jnp.asarray(C[0])
    u1 = jnp.zeros((n,), jnp.float32)
    interpret = jax.default_backend() == "cpu"
    np.asarray(pallas_min_trick(C1, u1, interpret=interpret))
    ts = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        np.asarray(pallas_min_trick(C1, u1, interpret=interpret))
        ts.append(time.perf_counter() - t0)
    gbs = (n * n * 4 / 1e9) / min(ts)
    print(f"pallas min-trick: {gbs:.1f} GB/s ({min(ts)*1e3:.2f} ms)")

    print(json.dumps({"per_mesh": results, "min_trick_gb_s": round(gbs, 2)}))


if __name__ == "__main__":
    main()
