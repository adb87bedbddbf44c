"""Multi-host (multi-process) distribution entry.

The reference has no in-process distribution at all (SURVEY.md §2.3);
its only scale-out is HTCondor job fan-out. The single-process SPMD
path (parallel/mesh.py) already covers one host with any number of
local chips. This module adds the multi-host rung of the same ladder:
on a TPU pod slice (e.g. v5e pods spanning hosts), each host process
calls ``ensure_distributed()`` once at startup, after which
``jax.devices()`` is the GLOBAL device list and the existing
mesh/psum/GSPMD code works across hosts unchanged — XLA routes
collectives over ICI within a slice and DCN across slices.

Environment-driven (the standard JAX convention): on Cloud TPU the
coordinator/process count/process id are auto-detected and
``jax.distributed.initialize()`` needs no arguments; elsewhere set
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (or pass
them explicitly). With none of those present this is a documented
no-op so every single-host entry point can call it unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from psi_tpu.parallel.mesh import make_mesh

_initialized = False


def ensure_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed exactly once, if multi-process is configured.

    Returns True when running (or now initialized) as part of a
    multi-process job, False when single-process (no-op). Safe to call
    from every CLI entry point.
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")

    # Opt-in only: multi-process requires an explicit coordinator (arg or
    # JAX_COORDINATOR_ADDRESS). Cloud-TPU auto-detection env vars are NOT
    # used as a trigger — single-host images may set them (this one sets
    # TPU_WORKER_HOSTNAMES=localhost).
    if coordinator_address is None:
        return False  # single-process run

    # best-effort early diagnosis (the check itself uses a private API,
    # so degrade gracefully on JAX upgrades: initialize() below still
    # raises its own error when called too late)
    try:
        from jax._src import xla_bridge  # private; may move between versions

        backends_up = xla_bridge.backends_are_initialized()
    except Exception:
        backends_up = False
    if backends_up:  # too late to initialize
        raise RuntimeError(
            "ensure_distributed() must run before any JAX computation "
            "(jax.devices, device_put, jit, ...) in a multi-process job; "
            "call it first thing in the entry point."
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh(axis_name: str = "dp"):
    """1-D mesh over ALL devices (all processes' chips after
    ensure_distributed; just the local ones single-process)."""
    return make_mesh(axis_name=axis_name)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
