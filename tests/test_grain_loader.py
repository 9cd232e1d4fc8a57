"""grain input pipeline over the real pose dataset (multi-host-ready
loader; SURVEY.md §2.9's per-host input sharding replacement for
DataLoader workers)."""

import numpy as np
import pytest

grain = pytest.importorskip("grain.python")

from tauv_vision_tpu.data.dataset_dir import Split  # noqa: E402
from tauv_vision_tpu.data.grain_loader import make_grain_loader  # noqa: E402
from tauv_vision_tpu.data.pose_dataset import (  # noqa: E402
    PoseDataset,
    collate_pose_samples,
)
from tests.test_eval_data import _make_pose_dataset, _object_config  # noqa: E402


def test_grain_loader_over_pose_dataset(tmp_path):
    _make_pose_dataset(tmp_path, n=4)
    oc = _object_config()
    ds = PoseDataset(tmp_path, Split.TRAIN, oc.label_id_to_index, oc, None)

    loader = make_grain_loader(
        ds, batch_size=2,
        collate_fn=lambda s: collate_pose_samples(s, 4, 8),
        shuffle=True, seed=0, worker_count=0,
    )
    batches = list(loader)
    assert len(batches) == 1  # 3 train samples, batch 2, drop remainder
    img, truth = batches[0]
    assert img.shape == (2, 64, 96, 3)
    assert truth.valid.shape == (2, 4)
    assert truth.valid[:, 0].all()


def test_grain_loader_deterministic_order(tmp_path):
    _make_pose_dataset(tmp_path, n=4)
    oc = _object_config()
    ds = PoseDataset(tmp_path, Split.TRAIN, oc.label_id_to_index, oc, None)

    def run():
        loader = make_grain_loader(
            ds, batch_size=2,
            collate_fn=lambda s: collate_pose_samples(s, 4, 8),
            shuffle=True, seed=7, worker_count=0,
        )
        return [np.asarray(b[0]).sum() for b in loader]

    assert run() == run()
