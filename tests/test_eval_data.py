"""Evaluation harness + dataset layer tests (with a synthetic on-disk
dataset exercising the full dataset-dir contract)."""

import json
import pathlib
from math import pi

import numpy as np
import pytest

from tauv_vision_tpu.configs import AngleConfig, ObjectConfig, ObjectConfigSet
from tauv_vision_tpu.data import augment
from tauv_vision_tpu.data.dataset_dir import (
    DatasetSample,
    Split,
    write_classes,
    write_meta,
    write_sample,
    write_splits,
)
from tauv_vision_tpu.data.loader import BatchLoader, ConcatDataset
from tauv_vision_tpu.data.pose_dataset import PoseDataset, collate_pose_samples
from tauv_vision_tpu.data.segmentation_dataset import (
    SegmentationDataset,
    collate_segmentation_samples,
)
from tauv_vision_tpu.eval.detection_eval import (
    EvalDetection,
    average_precision,
    center_distance_match,
    detection_iou,
    iou_match,
    precision_recall,
    precision_recall_curve,
)


def test_detection_iou_and_matching():
    a = EvalDetection(0, 1.0, 0.5, 0.5, 0.2, 0.2)
    b = EvalDetection(0, 0.9, 0.5, 0.5, 0.2, 0.2)
    assert detection_iou(a, b) == pytest.approx(1.0)
    assert iou_match(0.5)(a, b)
    c = EvalDetection(1, 0.9, 0.5, 0.5, 0.2, 0.2)
    assert not iou_match(0.5)(a, c)  # label mismatch
    assert center_distance_match(0.1)(a, b)


def test_precision_recall_greedy():
    truths = [[EvalDetection(0, 1, 0.5, 0.5, 0.2, 0.2),
               EvalDetection(0, 1, 0.2, 0.2, 0.1, 0.1)]]
    dets = [[
        EvalDetection(0, 0.9, 0.5, 0.5, 0.2, 0.2),   # TP
        EvalDetection(0, 0.8, 0.51, 0.5, 0.2, 0.2),  # duplicate -> FP
        EvalDetection(0, 0.7, 0.9, 0.9, 0.1, 0.1),   # FP
    ]]
    p, r = precision_recall(dets, truths, iou_match(0.5))
    assert p == pytest.approx(1 / 3)
    assert r == pytest.approx(1 / 2)

    thresholds, precision, recall = precision_recall_curve(
        dets, truths, iou_match(0.5), n_thresholds=5
    )
    assert len(thresholds) == 5
    assert precision[-1] == 1.0  # nothing above score 1.0 -> vacuous precision
    ap = average_precision(precision, recall)
    assert 0.0 <= ap <= 1.0


# ---------------------------------------------------------------------------
# Synthetic on-disk dataset (the convert_replicator output contract).
# ---------------------------------------------------------------------------

def _make_pose_dataset(root: pathlib.Path, n: int = 4, h: int = 64, w: int = 96):
    rng = np.random.default_rng(0)
    data = root / "data"
    ids = []
    projection = [[100.0, 0, w / 2, 0], [0, 100.0, h / 2, 0], [0, 0, 1, 0]]
    for i in range(n):
        id = f"{i:06d}"
        ids.append(id)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        seg = np.full((h, w), 255, np.uint8)
        seg[10:30, 20:50] = 0
        objects = [
            {
                "label": "torpedo",
                "class_id": "torpedo",
                "bbox": {"x": 0.4, "y": 0.3, "w": 0.25, "h": 0.3},
                "pose": {
                    "roll": 0.1, "pitch": 0.2, "yaw": 0.3, "distance": 2.0,
                    "cam_t_object": [
                        1, 0, 0, 0.0,
                        0, 1, 0, 0.0,
                        0, 0, 1, 2.0,
                        0, 0, 0, 1,
                    ],
                },
            }
        ]
        camera = {"h": h, "w": w, "projection": projection}
        write_sample(data, DatasetSample(id=id, img=img, seg=seg,
                                         objects=objects, camera=camera))
    write_splits(root, {"train": ids[:3], "val": ids[3:], "test": []})
    write_classes(root, ["torpedo"])
    write_meta(root, "test", "synthetic", "2026-01-01T00:00:00")
    return ids


def _object_config():
    return ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="torpedo",
                yaw=AngleConfig(train=True, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=True,
                train_keypoints=True,
                keypoints=((0.0, 0.0, 0.0), (0.05, 0.0, 0.0)),
            ),
        )
    )


def test_pose_dataset_roundtrip(tmp_path):
    _make_pose_dataset(tmp_path)
    oc = _object_config()
    ds = PoseDataset(
        tmp_path, Split.TRAIN, oc.label_id_to_index, oc, transform=None
    )
    assert len(ds) == 3
    sample = ds[0]
    assert sample["img"].shape == (64, 96, 3)
    assert len(sample["label"]) == 1
    np.testing.assert_allclose(sample["center"][0], [0.3, 0.4], atol=1e-6)
    np.testing.assert_allclose(sample["size"][0], [0.3, 0.25], atol=1e-6)
    assert sample["depth"][0] == pytest.approx(2.0)
    # Both keypoints project near the principal point (object at origin).
    assert len(sample["keypoint_label"]) == 2
    assert sample["keypoint_object_index"].tolist() == [0, 0]
    np.testing.assert_allclose(sample["keypoint_center"][0], [0.5, 0.5],
                               atol=0.01)

    img, truth = collate_pose_samples([ds[0], ds[1]], max_objects=4,
                                      max_keypoints=8)
    assert img.shape == (2, 64, 96, 3)
    assert truth.valid.shape == (2, 4)
    assert truth.valid[:, 0].all() and not truth.valid[:, 1].any()
    assert truth.keypoint_valid[:, :2].all()


def test_pose_dataset_with_augmentation(tmp_path):
    _make_pose_dataset(tmp_path)
    oc = _object_config()
    transform = augment.Compose(
        [augment.HorizontalFlip(p=1.0)], min_visibility=0.1
    )
    ds = PoseDataset(
        tmp_path, Split.TRAIN, oc.label_id_to_index, oc, transform=transform
    )
    sample = ds[0]
    # x center mirrors: 0.4 -> ~0.6 (within a pixel of exact mirror).
    assert abs(sample["center"][0][1] - 0.6) < 0.02
    assert abs(sample["center"][0][0] - 0.3) < 0.02


def test_segmentation_dataset_roundtrip(tmp_path):
    _make_pose_dataset(tmp_path)
    ds = SegmentationDataset(
        tmp_path, Split.TRAIN, {"torpedo": 1}, transform=None
    )
    sample = ds[0]
    assert sample["seg"].shape == (64, 96)
    assert sample["classifications"][0] == 1
    # (y, x, h, w) ordering.
    np.testing.assert_allclose(sample["boxes"][0], [0.3, 0.4, 0.3, 0.25],
                               atol=1e-5)
    img, truth = collate_segmentation_samples([sample, ds[1]], max_objects=3)
    assert truth.box.shape == (2, 3, 4)
    assert truth.seg_map.shape == (2, 64, 96)
    assert truth.img_valid.all()


def test_batch_loader_and_concat(tmp_path):
    _make_pose_dataset(tmp_path)
    oc = _object_config()
    ds = PoseDataset(tmp_path, Split.TRAIN, oc.label_id_to_index, oc, None)
    concat = ConcatDataset([ds, ds])
    assert len(concat) == 6
    loader = BatchLoader(
        concat, batch_size=2,
        collate_fn=lambda s: collate_pose_samples(s, 4, 8),
        n_workers=2, seed=1,
    )
    batches = list(loader)
    assert len(batches) == 3
    img, truth = batches[0]
    assert img.shape == (2, 64, 96, 3)


def test_augment_compose_filters():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    # One box fully inside, one near the right edge that a big shift
    # pushes out.
    bboxes = np.asarray([[0.3, 0.3, 0.5, 0.5], [0.9, 0.4, 1.0, 0.6]],
                       np.float32)
    labels = np.asarray([1, 2])

    class ShiftRight(augment.Transform):
        def __call__(self, sample, rng):
            h, w = sample.image.shape[:2]
            m = np.asarray([[1, 0, 0.4 * w], [0, 1, 0], [0, 0, 1]], np.float32)
            return augment._apply_matrix_to_sample(sample, m, (h, w))

    out = augment.Compose([ShiftRight()], min_visibility=0.3)(
        augment.Sample(image=img, bboxes=bboxes,
                       bbox_fields={"labels": labels}),
        rng,
    )
    assert len(out.bboxes) == 1
    assert out.bbox_fields["labels"].tolist() == [1]
    # Surviving box shifted by 0.4.
    np.testing.assert_allclose(out.bboxes[0][0], 0.7, atol=1e-5)


def test_augment_mask_invalid_fill():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    mask = np.zeros((32, 32), np.int32)
    ssr = augment.ShiftScaleRotate(p=1.0, shift_limit=(0.3, 0.3),
                                  scale_limit=(0.0, 0.0),
                                  rotate_limit=(0.0, 0.0))
    out = ssr(augment.Sample(image=img, mask=mask), rng)
    # Shifted-in region is filled with 254 (invalid).
    assert (out.mask == augment.MASK_INVALID).any()
    assert (out.mask == 0).any()
