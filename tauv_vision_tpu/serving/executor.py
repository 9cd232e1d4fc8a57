"""Pipelined serving executor: overlap host IO with device compute.

The fused pipelines (serving/pipeline.py) cross host->HBM once per
batch, but a naive serve loop still serializes upload -> compute ->
download.  jax dispatch is async, so the executor only has to keep the
pipe full:

- a producer thread ``jax.device_put``s upcoming frame batches
  (bounded prefetch queue);
- the main loop dispatches the jitted pipeline on already-resident
  inputs (returns immediately);
- a consumer thread materializes outputs to numpy (the device->host
  copy), so the next batch's compute runs during the previous batch's
  download.

Order is preserved.  This is the host-side analog of the reference
nodes' callback pipelining (the ROS transport overlapped capture with
inference by queueing; centernet_node.py:62-79), built for throughput.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax
import numpy as np


class ServingExecutor:
    """Stream batches through a jitted pipeline with prefetch.

    Args:
      pipeline: jitted ``(variables, frames) -> outputs`` (any pytree).
      variables: model variables (left on device).
      prefetch: max batches resident ahead of compute (2 = classic
        double buffering).
    """

    def __init__(
        self,
        pipeline: Callable[[Any, Any], Any],
        variables: Any,
        prefetch: int = 2,
        device: Optional[jax.Device] = None,
    ):
        self._pipeline = pipeline
        self._variables = variables
        self._prefetch = max(1, prefetch)
        self._device = device or jax.devices()[0]

    def run(
        self, frames_iter: Iterable[np.ndarray], to_numpy: bool = True
    ) -> Iterator[Any]:
        """Yield pipeline outputs for each input batch, in order.

        Closing the generator early (``close()`` / GC / ``break``)
        signals the worker threads to stop; they drain their queues and
        exit instead of blocking on the bounded queues forever holding
        device buffers.  The first worker error is raised as soon as the
        in-order results ahead of it have been yielded, not only after
        the stream ends.
        """
        uploaded: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        dispatched: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        _END = object()
        errors = []
        stop = threading.Event()

        def put_until_stop(q: "queue.Queue", item) -> bool:
            """put() that gives up when the generator was closed."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def uploader():
            try:
                for frames in frames_iter:
                    if not put_until_stop(
                        uploaded, jax.device_put(frames, self._device)
                    ):
                        return
                    if stop.is_set():
                        return
            except Exception as e:  # surfaced by the main generator
                errors.append(e)
            finally:
                put_until_stop(uploaded, _END)

        threading.Thread(target=uploader, daemon=True).start()

        def materialize(out):
            if not to_numpy:
                jax.block_until_ready(out)
                return out
            return jax.tree_util.tree_map(np.asarray, out)

        results: "queue.Queue" = queue.Queue(maxsize=self._prefetch)

        def downloader():
            try:
                while not stop.is_set():
                    try:
                        out = dispatched.get(timeout=0.1)
                    except queue.Empty:
                        continue
                    if out is _END:
                        break
                    if not put_until_stop(results, materialize(out)):
                        return
            except Exception as e:
                errors.append(e)
            finally:
                put_until_stop(results, _END)

        threading.Thread(target=downloader, daemon=True).start()

        def dispatcher():
            try:
                while not stop.is_set():
                    try:
                        frames = uploaded.get(timeout=0.1)
                    except queue.Empty:
                        continue
                    if frames is _END:
                        break
                    if not put_until_stop(
                        dispatched, self._pipeline(self._variables, frames)
                    ):
                        return
            except Exception as e:
                errors.append(e)
            finally:
                put_until_stop(dispatched, _END)

        threading.Thread(target=dispatcher, daemon=True).start()

        try:
            while True:
                if errors:
                    raise errors[0]
                out = results.get()
                if out is _END:
                    break
                yield out
            if errors:
                raise errors[0]
        finally:
            stop.set()
