"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``xla_force_host_platform_device_count`` (no TPU needed in CI); Pallas
kernels run in interpret mode on CPU (see psi_tpu.ops).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Force CPU: the session env may point JAX at a tunneled TPU, which makes
# per-test compiles slow and uses bf16 matmuls by default. The env var
# alone is overridden by the TPU plugin, so use the config API.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
