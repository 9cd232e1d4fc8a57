"""Device mesh + sharding utilities.

The reference is single-GPU (SURVEY.md §2.9: no distributed anything);
the TPU-idiomatic expression of the same workload is data parallelism
over a 1-D ``jax.sharding.Mesh`` with XLA inserting the gradient
all-reduce, plus hooks for a 2-D (data, model) mesh for activation/state
sharding as models grow.

Everything here works identically on one real chip, N real chips, or the
virtual CPU mesh used by tests and the driver's ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data[, model]) mesh.

    Args:
      n_data: data-parallel size; defaults to all available devices / n_model.
      n_model: model-parallel size (1 = pure DP).
      devices: device list override (defaults to jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = devices[: n_data * n_model]
    arr = np.asarray(used).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every leaf of a batch pytree, sharded on axis 0."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
