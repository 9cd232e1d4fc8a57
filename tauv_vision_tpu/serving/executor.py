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
        """Yield pipeline outputs for each input batch, in order."""
        uploaded: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        dispatched: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        _END = object()
        errors = []

        def uploader():
            try:
                for frames in frames_iter:
                    uploaded.put(jax.device_put(frames, self._device))
            except Exception as e:  # surfaced by the main generator
                errors.append(e)
            finally:
                uploaded.put(_END)

        threading.Thread(target=uploader, daemon=True).start()

        def materialize(out):
            if not to_numpy:
                jax.block_until_ready(out)
                return out
            return jax.tree_util.tree_map(np.asarray, out)

        results: "queue.Queue" = queue.Queue(maxsize=self._prefetch)

        def downloader():
            try:
                while True:
                    out = dispatched.get()
                    if out is _END:
                        break
                    results.put(materialize(out))
            except Exception as e:
                errors.append(e)
            finally:
                results.put(_END)

        threading.Thread(target=downloader, daemon=True).start()

        def dispatcher():
            try:
                while True:
                    frames = uploaded.get()
                    if frames is _END:
                        break
                    dispatched.put(self._pipeline(self._variables, frames))
            except Exception as e:
                errors.append(e)
            finally:
                dispatched.put(_END)

        threading.Thread(target=dispatcher, daemon=True).start()

        while True:
            out = results.get()
            if out is _END:
                break
            yield out
        if errors:
            raise errors[0]
