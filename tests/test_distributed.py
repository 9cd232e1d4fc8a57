"""Multi-host initialization helpers (parallel/distributed.py).

True multi-process can't run in this image; these cover the
single-process no-op contract and the host-local batch math that
data/grain_loader.py's per-host sharding relies on.
"""

import jax

from tauv_vision_tpu.parallel import distributed


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert distributed.initialize() is False
    assert distributed.process_count() == 1
    assert distributed.process_index() == 0


def test_initialize_num_processes_one_noop(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert distributed.initialize() is False


def test_host_local_batch_slice():
    s = distributed.host_local_batch_slice(32)
    assert (s.start, s.stop) == (0, 32)


def test_host_local_batch_slice_multiprocess(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    s = distributed.host_local_batch_slice(32)
    assert (s.start, s.stop) == (16, 24)

    import pytest

    with pytest.raises(ValueError):
        distributed.host_local_batch_slice(33)


def test_global_array_roundtrip():
    import numpy as np

    from tauv_vision_tpu.parallel.mesh import batch_sharding, create_mesh

    mesh = create_mesh()
    x = np.arange(
        4 * max(1, len(jax.devices())), dtype=np.float32
    ).reshape(-1, 1)
    arr = distributed.global_array_from_host_local(
        x, mesh, batch_sharding(mesh)
    )
    np.testing.assert_array_equal(np.asarray(arr), x)
