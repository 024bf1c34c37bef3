"""lapgnn_tpu — TPU-native GNN-accelerated LAP warm-start framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
egbariajad/GNN-Accelerated-LAP-Warm-Start-Pipeline (reference mounted at
/root/reference): learned dual-potential prediction (OneGNN / DualGNN),
dual feasibility math, seeded Jonker–Volgenant solving, dataset generation,
training, evaluation and benchmarking — all batched, jittable and shardable
over a TPU device mesh.

Layer map (bottom → top):
  ops/       pure-function numeric kernels (dual math, features, Pallas kernels)
  solver/    LAP solvers: batched JAX JV + auction, seeded warm-start path,
             from-scratch C++ host oracle, SciPy wrapper, verification, timing
  models/    flax.linen OneGNN / DualGNN
  data/      cost-family generators, synthetic instances, HDF5 io, splits
  train/     losses, optax training loops, progressive curriculum, checkpoints
  parallel/  mesh / sharding / shard_map collective ops for multi-chip runs
  bench/     rigorous timing harness + benchmark logging
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS request (e.g. "cpu" for the virtual-mesh
# dryrun/test paths) even when a site config pins jax_platforms to the TPU
# tunnel — standard JAX env behavior that the pinned config would otherwise
# override.  No-op when the env var is unset or jax is already initialized.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - jax already initialized
        pass
