"""Device mesh + sharding helpers — the framework's scale-out layer.

The reference has no in-process distribution (SURVEY.md §2.3: only
HTCondor job fan-out and an unused nn.DataParallel). The TPU-native
design is SPMD over a ``jax.sharding.Mesh``:

* training: batch axis sharded over 'dp'; params/assets replicated;
  XLA inserts the gradient all-reduce (psum) over ICI.
* generation/fitting/eval: the *body population* axis is sharded over
  'dp' — hundreds of bodies per chip run as one program, the metric
  reductions all-reduce at the end.

Everything works on a CPU mesh (xla_force_host_platform_device_count)
for testing and on real TPU slices unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """1-D data/population-parallel mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh, axis_name: str = "dp") -> Dict[str, jax.Array]:
    """Place every leaf with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
