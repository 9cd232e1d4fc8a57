"""YOLO-Pose configuration.

Parity target: ``yolo_pose/model/config.py`` (the YOLACT config plus
pointnet / belief / affinity knobs).  The reference subtree is stale
(non-importable paths, empty inference); this config serves the rebuilt,
working family.
"""

from __future__ import annotations

import json
import pathlib
from dataclasses import asdict, dataclass
from typing import Tuple


@dataclass(frozen=True)
class YoloPoseModelConfig:
    in_w: int
    in_h: int

    feature_depth: int

    n_classes: int
    n_prototype_masks: int

    n_masknet_layers_pre_upsample: int
    n_masknet_layers_post_upsample: int

    # Each stage: (kernel_size, layer_count, stage_final_depth).
    pointnet_layers: Tuple[Tuple[int, int, int], ...]
    pointnet_feature_depth: int
    prototype_belief_depth: int
    prototype_affinity_depth: int
    belief_depth: int      # keypoints per object
    affinity_depth: int    # 2 * belief_depth

    n_prediction_head_layers: int
    n_fpn_downsample_layers: int

    belief_sigma: float
    affinity_radius: float

    anchor_scales: Tuple[float, ...]
    anchor_aspect_ratios: Tuple[float, ...]

    box_variances: Tuple[float, float]

    iou_pos_threshold: float
    iou_neg_threshold: float

    negative_example_ratio: int

    img_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    img_stddev: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    # 18/34 (BasicBlock) or 50/101 (Bottleneck) — the stale reference
    # backbone declared ResNet-101 with ResNet-18 tap depths; here both
    # are real options.
    backbone_depth: int = 18

    def __post_init__(self):
        object.__setattr__(
            self, "pointnet_layers",
            tuple(tuple(layer) for layer in self.pointnet_layers),
        )
        for name in ("anchor_scales", "anchor_aspect_ratios", "box_variances",
                     "img_mean", "img_stddev"):
            object.__setattr__(self, name, tuple(getattr(self, name)))

    @property
    def n_anchors_per_cell(self) -> int:
        return len(self.anchor_aspect_ratios)

    @property
    def n_fpn_levels(self) -> int:
        return 3 + self.n_fpn_downsample_layers

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, data: dict) -> "YoloPoseModelConfig":
        return cls(**data)

    def save(self, path: pathlib.Path):
        with open(path, "w") as fp:
            json.dump(self.to_dict(), fp, indent=2)

    @classmethod
    def load(cls, path: pathlib.Path) -> "YoloPoseModelConfig":
        with open(path) as fp:
            return cls.from_dict(json.load(fp))
