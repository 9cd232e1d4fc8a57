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


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """2-D activation sharding for NHWC maps: batch over the data axis,
    image WIDTH over the model axis.

    Spatial partitioning is the TPU-idiomatic model-parallel form for
    CNNs: GSPMD propagates the width split through every conv, inserting
    halo exchanges (collective-permutes over ICI) at kernel boundaries,
    so the activation-heavy DLA trees / protonet fit in per-chip HBM at
    large inputs (SURVEY.md §2.9's 2-D mesh hook).
    """
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS, None, MODEL_AXIS, None))


def has_model_axis(mesh: Mesh) -> bool:
    return MODEL_AXIS in mesh.shape and mesh.shape[MODEL_AXIS] > 1


def small_map_guard(mesh: Optional[Mesh], min_shard_width: int = 4):
    """Interceptor context: pin convolution inputs whose per-shard width
    would drop below ``min_shard_width`` back to data-only sharding.

    Spatial partitioning stops paying once a feature map is a few pixels
    wide — the halo is as large as the shard — and XLA's halo-exchange
    grad handling of width-1 shards is numerically unsound (measured on
    the CPU backend: O(1) relative gradient error on a 3x3 conv over
    width-1 shards, exact at >=2).  Deep detector levels (c5/p6/p7) are
    tiny, so the guard re-replicates them while the activation-heavy
    early levels stay width-sharded.
    """
    import contextlib

    if mesh is None or not has_model_axis(mesh):
        return contextlib.nullcontext()

    import flax.linen as nn
    import jax.numpy as jnp

    n_model = mesh.shape[MODEL_AXIS]
    data_only = NamedSharding(mesh, PartitionSpec(DATA_AXIS, None, None, None))

    def interceptor(next_fn, args, kwargs, context):
        if (
            context.method_name == "__call__"
            and args
            and isinstance(context.module, nn.Conv)
            and isinstance(args[0], jnp.ndarray)
            and args[0].ndim == 4
            and args[0].shape[2] < min_shard_width * n_model
        ):
            args = (
                jax.lax.with_sharding_constraint(args[0], data_only),
            ) + args[1:]
        return next_fn(*args, **kwargs)

    return nn.intercept_methods(interceptor)


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
