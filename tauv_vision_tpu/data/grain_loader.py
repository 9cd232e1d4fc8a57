"""grain-based input pipeline (multi-host-ready loader).

SURVEY.md §2.9 names grain/tf.data per-host input sharding as the
TPU-idiomatic replacement for torch DataLoader workers.  This module
wraps the framework's datasets as grain data sources and builds a
``grain.DataLoader`` with worker processes, per-host sharding, and the
static-padding collate applied as an operation — the scale-out path,
alongside the simpler in-process ``data.loader.BatchLoader``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import grain.python as grain


class _DatasetSource(grain.RandomAccessDataSource):
    """Adapter: any __len__/__getitem__ dataset -> grain data source."""

    def __init__(self, dataset: Any):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, index):
        return self._dataset[index]


def make_grain_loader(
    dataset: Any,
    batch_size: int,
    collate_fn: Callable[[Sequence[Any]], Any],
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
    shard_by_process: bool = True,
    drop_remainder: bool = True,
):
    """Build a grain DataLoader over a framework dataset.

    - ``worker_count > 0`` uses grain worker processes (the DataLoader
      ``num_workers`` analog, but with deterministic sharding);
    - ``shard_by_process`` shards the index space across jax processes so
      each host reads a disjoint slice (multi-host input pipeline).
    """
    source = _DatasetSource(dataset)

    shard_options = (
        grain.ShardByJaxProcess(drop_remainder=drop_remainder)
        if shard_by_process
        else grain.NoSharding()
    )

    sampler = grain.IndexSampler(
        num_records=len(source),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=shard_options,
    )

    # The framework's padding collate IS the batch function (ragged
    # samples pad to static shapes, so grain's default stacking would
    # fail on them).
    operations = [
        grain.Batch(
            batch_size=batch_size,
            drop_remainder=drop_remainder,
            batch_fn=lambda samples: collate_fn(list(samples)),
        ),
    ]

    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=operations,
        worker_count=worker_count,
    )
