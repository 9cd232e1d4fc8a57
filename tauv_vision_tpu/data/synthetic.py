"""Synthetic square-detection data.

Parity target: ``tests/centernet_square_detection.py:64-126`` — rotated
squares painted on noise, labels = (center, size, yaw mod pi/2).  This is
the zero-external-data integration workload: CPU-runnable, procedurally
labeled, used by the end-to-end train tests and the driver's validation
config (BASELINE.json names the reference file).

Pure numpy on host; batches convert to jnp at the device boundary.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import pi
from typing import Optional, Tuple

import numpy as np

from tauv_vision_tpu.train.centernet_task import CenternetTruth


@dataclass
class SquareDatasetConfig:
    in_h: int = 64
    in_w: int = 64
    max_objects: int = 2
    min_side: int = 10
    max_side: int = 24
    noise_level: float = 0.3
    rotate: bool = True
    keypoints: bool = False  # emit the 4 square corners as keypoints


# Unit-square corner offsets (object frame, (y, x) in half-side units):
# the synthetic keypoint set (4 per object, fixed order so the global
# keypoint index is well-defined).  3D object points for PnP-style
# configs: (y, x, 0) with z = 0.
SQUARE_CORNERS = ((-0.5, -0.5), (-0.5, 0.5), (0.5, 0.5), (0.5, -0.5))


def _paint_square(
    img: np.ndarray, cy: float, cx: float, side: float, theta: float
) -> None:
    h, w, _ = img.shape
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dy = y - cy
    dx = x - cx
    ry = np.cos(theta) * dy - np.sin(theta) * dx
    rx = np.sin(theta) * dy + np.cos(theta) * dx
    inside = (np.abs(ry) <= side / 2) & (np.abs(rx) <= side / 2)
    img[inside] = 1.0


def generate_square_batch(
    rng: np.random.Generator,
    batch_size: int,
    config: Optional[SquareDatasetConfig] = None,
) -> Tuple[np.ndarray, CenternetTruth]:
    """Returns (img [B, H, W, 3] float32 in [0, 1]-ish, truth)."""
    cfg = config or SquareDatasetConfig()
    h, w, n = cfg.in_h, cfg.in_w, cfg.max_objects

    img = rng.uniform(0, cfg.noise_level, (batch_size, h, w, 3)).astype(np.float32)
    valid = np.zeros((batch_size, n), bool)
    label = np.zeros((batch_size, n), np.int32)
    center = np.zeros((batch_size, n, 2), np.float32)
    size = np.zeros((batch_size, n, 2), np.float32)
    yaw = np.zeros((batch_size, n), np.float32)
    k_slots = 4 * n
    kp_valid = np.zeros((batch_size, k_slots), bool)
    kp_label = np.zeros((batch_size, k_slots), np.int32)
    kp_center = np.zeros((batch_size, k_slots, 2), np.float32)
    kp_object = np.zeros((batch_size, k_slots), np.int32)

    for b in range(batch_size):
        n_objects = int(rng.integers(1, n + 1))
        for i in range(n_objects):
            side = float(rng.uniform(cfg.min_side, cfg.max_side))
            margin = side
            cy = float(rng.uniform(margin, h - margin))
            cx = float(rng.uniform(margin, w - margin))
            theta = float(rng.uniform(0, pi / 2)) if cfg.rotate else 0.0

            _paint_square(img[b], cy, cx, side, theta)

            valid[b, i] = True
            center[b, i] = (cy / h, cx / w)
            # Axis-aligned extent of a rotated square.
            extent = side * (abs(np.cos(theta)) + abs(np.sin(theta)))
            size[b, i] = (extent / h, extent / w)
            yaw[b, i] = theta

            if cfg.keypoints:
                # Corners in SQUARE_CORNERS order, rotated into image
                # coords (inverse of _paint_square's rotation).
                ct, st = np.cos(theta), np.sin(theta)
                for ki, (ry, rx) in enumerate(SQUARE_CORNERS):
                    dy = (ct * ry + st * rx) * side
                    dx = (-st * ry + ct * rx) * side
                    slot = 4 * i + ki
                    kp_valid[b, slot] = True
                    kp_label[b, slot] = ki  # global kp index (1 class)
                    kp_center[b, slot] = ((cy + dy) / h, (cx + dx) / w)
                    kp_object[b, slot] = i

    truth = CenternetTruth(
        valid=valid,
        label=label,
        center=center,
        size=size,
        yaw=yaw,
        roll=np.zeros_like(yaw),
        pitch=np.zeros_like(yaw),
        depth=np.ones_like(yaw),
        keypoint_valid=kp_valid if cfg.keypoints else None,
        keypoint_label=kp_label if cfg.keypoints else None,
        keypoint_center=kp_center if cfg.keypoints else None,
        keypoint_object_index=kp_object if cfg.keypoints else None,
    )
    return img, truth


def generate_square_seg_batch(
    rng: np.random.Generator,
    batch_size: int,
    config: Optional[SquareDatasetConfig] = None,
):
    """Synthetic instance-segmentation batch for the YOLACT workload:
    axis-aligned colored squares on noise, instance seg map in the
    dataset-dir convention (object index per pixel, 255 = background —
    segmentation_dataset.py semantics).

    Returns ``(img [B, H, W, 3] float32, fields)`` with fields a dict of
    numpy arrays shaped like :class:`~...train.yolact_task.YolactTruth`:
    valid [B, M], classification [B, M] (all 1 = the square class),
    box [B, M, 4] normalized (y, x, h, w), seg [B, H, W] uint8,
    img_valid [B, H, W] bool (all True — no warp-invalid regions).
    """
    cfg = config or SquareDatasetConfig()
    h, w, n = cfg.in_h, cfg.in_w, cfg.max_objects

    img = rng.uniform(0, cfg.noise_level, (batch_size, h, w, 3)).astype(
        np.float32
    )
    seg = np.full((batch_size, h, w), 255, np.uint8)
    valid = np.zeros((batch_size, n), bool)
    classification = np.zeros((batch_size, n), np.int32)
    box = np.zeros((batch_size, n, 4), np.float32)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for b in range(batch_size):
        n_objects = int(rng.integers(1, n + 1))
        placed = 0
        for _ in range(n_objects):
            # Reject overlapping placements (10 attempts) so each
            # instance's box stays consistent with its full mask.
            for _attempt in range(10):
                side = float(rng.uniform(cfg.min_side, cfg.max_side))
                cy = float(rng.uniform(side, h - side))
                cx = float(rng.uniform(side, w - side))
                inside = (np.abs(ys - cy) <= side / 2) & (
                    np.abs(xs - cx) <= side / 2
                )
                if (seg[b][inside] == 255).all():
                    break
            else:
                continue
            color = rng.uniform(0.5, 1.0, 3).astype(np.float32)
            img[b][inside] = color
            seg[b][inside] = placed
            valid[b, placed] = True
            classification[b, placed] = 1
            box[b, placed] = (cy / h, cx / w, side / h, side / w)
            placed += 1

    return img, {
        "valid": valid,
        "classification": classification,
        "box": box,
        "seg": seg,
        "img_valid": np.ones((batch_size, h, w), bool),
    }
