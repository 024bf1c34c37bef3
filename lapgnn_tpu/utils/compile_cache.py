"""Persistent XLA compilation cache + AOT compilation helpers.

Large-n programs pay a heavy first compile (the fused n=16384 pipeline took
~7 minutes through this environment's remote compile service).  Two remedies,
both wired into the serving pipeline:

  * ``enable_persistent_cache()`` — turns on JAX's on-disk compilation cache
    so any program compiled once (in any process) is a cache hit in every
    later session.  Safe to call repeatedly; respects ``LAPGNN_COMPILE_CACHE``.
  * ``aot_compile(fn, *args)`` — explicit ahead-of-time compilation via
    ``jit(fn).lower(...).compile()``; returns the loaded executable so
    serving can pay compilation at deploy time, not on the first request.

The reference has no analogue (single-process CPU C++; compilation is its
setup.py build step).  This is the XLA-era equivalent of shipping a
prebuilt .so.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax

__all__ = ["enable_persistent_cache", "aot_compile"]

_ENABLED = False


def enable_persistent_cache(path: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Returns the cache directory in use.  Every jit compile slower than 1s is
    written to disk and reloaded by subsequent sessions, turning the
    minutes-scale large-n first compile into a one-time cost per machine.
    """
    global _ENABLED
    cache_dir = str(
        Path(
            path
            or os.environ.get(
                "LAPGNN_COMPILE_CACHE",
                Path.home() / ".cache" / "lapgnn_tpu" / "xla_cache",
            )
        ).expanduser()
    )
    if not _ENABLED:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
        return cache_dir
    # Already enabled: honor the contract 'returns the cache directory in
    # use' — an explicit new path on a later call cannot take effect (the
    # pipeline enables the default at construction) and silently returning
    # it would mislead the caller about where compiles land.
    current = str(jax.config.jax_compilation_cache_dir)
    if path is not None and str(Path(path).expanduser()) != current:
        import warnings

        warnings.warn(
            f"persistent compile cache already enabled at {current}; "
            f"ignoring new path {path}",
            RuntimeWarning,
            stacklevel=2,
        )
    return current


def aot_compile(fn, *example_args, **jit_kwargs):
    """Ahead-of-time compile ``fn`` for the example arguments' shapes.

    ``fn`` may already be a jitted function; otherwise it is jitted with
    ``jit_kwargs``.  Returns the compiled executable (callable with arrays of
    exactly the lowered shapes/dtypes).
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn, **jit_kwargs)
    return jitted.lower(*example_args).compile()
