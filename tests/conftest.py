"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``xla_force_host_platform_device_count`` (no TPU needed in CI); Pallas
kernels run in interpret mode on CPU (see psi_tpu.ops).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Full-scale sharded steps on a 1-core host serialize the 8 device
# threads, so XLA's default 40 s collective-rendezvous termination
# timeout aborts the process mid-all-reduce (rendezvous.cc CHECK).
# Raise it well past the worst compute-per-collective we run in tests.
if "collective_call_terminate_timeout" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

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
