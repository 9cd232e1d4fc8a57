"""Multi-host (multi-process) initialization and host-local batching.

The reference is single-GPU; the single-host DP/2-D-mesh machinery lives
in :mod:`tauv_vision_tpu.parallel.mesh`.  This module adds the
multi-host entry points so the same train/serve code scales past one
host: call :func:`initialize` before any jax computation, build the
global mesh as usual (``jax.devices()`` then spans all hosts), and feed
each process its host-local slice of the global batch via
:func:`host_local_batch_slice` / ``jax.make_array_from_process_local_data``
(the per-host input sharding ``data/grain_loader.py`` produces).

On one process everything is a no-op, so single-host behavior —
including the driver's virtual-CPU-mesh dryrun — is unchanged.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> bool:
    """Initialize ``jax.distributed`` when running multi-process.

    Resolution order: explicit args, then the standard environment
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, or the TPU pod's automatic discovery — on a real
    TPU pod slice ``jax.distributed.initialize()`` with no args is
    correct).  Returns True when a multi-process runtime was
    initialized, False for the single-process no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES") not in (None, "")
    if coordinator_address is None and not on_pod:
        return False
    if num_processes is not None and num_processes <= 1:
        return False
    if coordinator_address is not None and not on_pod and (
        num_processes is None or process_id is None
    ):
        # Outside auto-detectable cluster environments, jax.distributed
        # cannot infer these; fail with the actual requirement instead
        # of a None-typed error from deep inside initialize().
        raise ValueError(
            "JAX_COORDINATOR_ADDRESS is set but num_processes/process_id "
            "are missing — set JAX_NUM_PROCESSES and JAX_PROCESS_ID (or "
            "pass them explicitly) when using an explicit coordinator"
        )

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def host_local_batch_slice(global_batch_size: int) -> slice:
    """This process's slice of a batch-axis-sharded global batch (the
    contract ``data/grain_loader.py``'s ShardOptions implement: process
    i reads rows [i*b, (i+1)*b) of each global batch)."""
    if global_batch_size % jax.process_count():
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{jax.process_count()} processes"
        )
    per = global_batch_size // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_array_from_host_local(x: Any, mesh, sharding) -> Any:
    """Assemble a global jax.Array from this process's host-local rows
    (wrapper over ``jax.make_array_from_process_local_data``)."""
    return jax.make_array_from_process_local_data(sharding, x)
