"""Pipelined serving executor (serving/executor.py): order preservation,
equivalence with the sequential loop, and error propagation."""

import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.serving.executor import ServingExecutor


def _pipeline(variables, frames):
    return {"sum": frames.astype(jnp.float32).sum(axis=(1, 2, 3)),
            "scaled": frames.astype(jnp.float32) * variables["scale"]}


def test_executor_matches_sequential():
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 255, (2, 4, 4, 3), np.uint8)
               for _ in range(7)]
    variables = {"scale": jnp.asarray(2.0)}
    pipeline = jax.jit(_pipeline)

    ex = ServingExecutor(pipeline, variables, prefetch=2)
    got = list(ex.run(iter(batches)))
    assert len(got) == len(batches)
    for out, frames in zip(got, batches):
        expected = frames.astype(np.float32)
        np.testing.assert_allclose(out["sum"],
                                   expected.sum(axis=(1, 2, 3)), rtol=1e-6)
        np.testing.assert_allclose(out["scaled"], expected * 2.0, rtol=1e-6)
        assert isinstance(out["sum"], np.ndarray)


def test_executor_device_outputs():
    variables = {"scale": jnp.asarray(1.0)}
    pipeline = jax.jit(_pipeline)
    batches = [np.zeros((1, 2, 2, 3), np.uint8)] * 3
    ex = ServingExecutor(pipeline, variables, prefetch=1)
    got = list(ex.run(iter(batches), to_numpy=False))
    assert len(got) == 3
    assert all(isinstance(o["sum"], jax.Array) for o in got)


def test_executor_propagates_input_errors():
    variables = {"scale": jnp.asarray(1.0)}
    pipeline = jax.jit(_pipeline)

    def bad_iter():
        yield np.zeros((1, 2, 2, 3), np.uint8)
        raise RuntimeError("boom")

    ex = ServingExecutor(pipeline, variables, prefetch=2)
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        list(ex.run(bad_iter()))
