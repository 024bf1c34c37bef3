"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Tests run on a simulated 8-device CPU mesh (the driver's dryrun uses the same
mechanism) and with x64 so solver math can be validated at the reference's
float64 precision.  Library code is dtype-polymorphic; TPU runs use float32.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# The environment pins jax_platforms to "axon,cpu" (TPU tunnel); tests must
# run on the virtual CPU mesh, so force it via config (env alone is ignored).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
