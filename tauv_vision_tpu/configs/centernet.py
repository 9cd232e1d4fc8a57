"""CenterNet configuration tree.

Mirrors the capability of the reference config system
(``centernet/model/config.py:7-196`` in TAUV-Vision): typed dataclasses
with dict/JSON round-trip, per-object ``ObjectConfig`` entries whose flags
(yaw/pitch/roll/depth/keypoints) *derive the network head structure*, and
a global keypoint-index codec mapping (object, local keypoint) <-> flat
keypoint channel.

Design difference from the reference: configs are frozen dataclasses so
they are hashable and can be passed as static arguments to ``jax.jit``.
"""

from __future__ import annotations

import json
import pathlib
from dataclasses import dataclass, asdict
from typing import Dict, Optional, Tuple


@dataclass(frozen=True)
class CenternetModelConfig:
    """Architecture + geometry knobs (reference: config.py:7-35)."""

    in_h: int
    in_w: int

    backbone_heights: Tuple[int, ...]
    backbone_channels: Tuple[int, ...]

    downsamples: int

    angle_bin_overlap: float

    def __post_init__(self):
        # Tolerate lists from JSON.
        object.__setattr__(self, "backbone_heights", tuple(self.backbone_heights))
        object.__setattr__(self, "backbone_channels", tuple(self.backbone_channels))

    @property
    def downsample_ratio(self) -> int:
        return 2 ** self.downsamples

    @property
    def out_h(self) -> int:
        return self.in_h // self.downsample_ratio

    @property
    def out_w(self) -> int:
        return self.in_w // self.downsample_ratio

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, data: dict) -> "CenternetModelConfig":
        return cls(**data)

    def save(self, path: pathlib.Path):
        with open(path, "w") as fp:
            json.dump(self.to_dict(), fp, indent=2)

    @classmethod
    def load(cls, path: pathlib.Path) -> "CenternetModelConfig":
        with open(path) as fp:
            return cls.from_dict(json.load(fp))


@dataclass(frozen=True)
class CenternetTrainConfig:
    """Training hyperparameters (reference: config.py:38-69)."""

    lr: float

    batch_size: int
    n_batches: int
    n_epochs: int

    heatmap_focal_loss_a: float
    heatmap_focal_loss_b: float
    heatmap_sigma_factor: float

    keypoint_heatmap_sigma: float
    keypoint_affinity_sigma: float

    loss_lambda_keypoint_heatmap: float
    loss_lambda_keypoint_affinity: float
    loss_lambda_size: float
    loss_lambda_offset: float
    loss_lambda_angle: float
    loss_lambda_depth: float

    n_workers: int = 0
    weight_save_interval: int = 10
    grad_max_norm: float = 1.0

    # DCN offset-range regularization (TPU addition): penalize learned
    # deformable-conv offsets beyond dcn_offset_range so the R-bounded
    # serving kernels (ops/pallas/deform_conv.py, exact for
    # |offset| <= R) are exact in practice.  0 disables (the reference
    # trains unconstrained offsets, centerpoint_dla.py:360-392).
    loss_lambda_dcn_offset: float = 0.0
    dcn_offset_range: float = 1.0

    # TPU additions (not in reference): max padded objects/keypoints per
    # sample so every batch has a static shape, and the compute dtype.
    max_objects: int = 16
    max_keypoints: int = 64
    compute_dtype: str = "bfloat16"

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, data: dict) -> "CenternetTrainConfig":
        return cls(**data)

    def save(self, path: pathlib.Path):
        with open(path, "w") as fp:
            json.dump(self.to_dict(), fp, indent=2)

    @classmethod
    def load(cls, path: pathlib.Path) -> "CenternetTrainConfig":
        with open(path) as fp:
            return cls.from_dict(json.load(fp))


@dataclass(frozen=True)
class AngleConfig:
    """Per-angle training flag + modulo (reference: config.py:72-82)."""

    train: bool
    modulo: Optional[float]

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, data: dict) -> "AngleConfig":
        return cls(**data)


@dataclass(frozen=True)
class ObjectConfig:
    """Per-class head configuration (reference: config.py:85-120)."""

    id: str

    yaw: AngleConfig
    pitch: AngleConfig
    roll: AngleConfig

    train_depth: bool
    train_keypoints: bool

    keypoints: Optional[Tuple[Tuple[float, float, float], ...]] = None

    def __post_init__(self):
        if self.keypoints is not None:
            object.__setattr__(
                self, "keypoints", tuple(tuple(kp) for kp in self.keypoints)
            )

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "yaw": self.yaw.to_dict(),
            "pitch": self.pitch.to_dict(),
            "roll": self.roll.to_dict(),
            "train_depth": self.train_depth,
            "train_keypoints": self.train_keypoints,
            "keypoints": [list(kp) for kp in self.keypoints]
            if self.keypoints is not None
            else None,
        }

    @classmethod
    def from_dict(cls, data: dict) -> "ObjectConfig":
        return cls(
            id=data["id"],
            yaw=AngleConfig.from_dict(data["yaw"]),
            pitch=AngleConfig.from_dict(data["pitch"]),
            roll=AngleConfig.from_dict(data["roll"]),
            train_depth=data["train_depth"],
            train_keypoints=data["train_keypoints"],
            keypoints=tuple(tuple(kp) for kp in data["keypoints"])
            if data.get("keypoints") is not None
            else None,
        )


@dataclass(frozen=True)
class ObjectConfigSet:
    """Set of per-class configs + the global keypoint-index codec
    (reference: config.py:124-196).

    ``train_*`` properties OR over all classes and derive which prediction
    heads exist on the network; keypoint channels are the concatenation of
    every class's local keypoint list.
    """

    configs: Tuple[ObjectConfig, ...]

    def __post_init__(self):
        object.__setattr__(self, "configs", tuple(self.configs))

    # -- head-structure derivation ------------------------------------
    @property
    def train_yaw(self) -> bool:
        return any(c.yaw.train for c in self.configs)

    @property
    def train_pitch(self) -> bool:
        return any(c.pitch.train for c in self.configs)

    @property
    def train_roll(self) -> bool:
        return any(c.roll.train for c in self.configs)

    @property
    def train_depth(self) -> bool:
        return any(c.train_depth for c in self.configs)

    @property
    def train_keypoints(self) -> bool:
        return any(c.train_keypoints for c in self.configs)

    @property
    def n_labels(self) -> int:
        return len(self.configs)

    @property
    def n_keypoints(self) -> int:
        return sum(
            len(c.keypoints) if c.keypoints is not None else 0 for c in self.configs
        )

    @property
    def label_id_to_index(self) -> Dict[str, int]:
        return {c.id: i for i, c in enumerate(self.configs)}

    # -- keypoint flat-index codec -------------------------------------
    def _keypoint_tables(self):
        encode: Dict[Tuple[int, int], int] = {}
        decode: Dict[int, Tuple[int, int]] = {}
        flat = 0
        for obj_i, c in enumerate(self.configs):
            if c.keypoints is None:
                continue
            for local_i in range(len(c.keypoints)):
                encode[(obj_i, local_i)] = flat
                decode[flat] = (obj_i, local_i)
                flat += 1
        return encode, decode

    def encode_keypoint_index(self, object_index: int, object_keypoint_index: int) -> int:
        return self._keypoint_tables()[0][(object_index, object_keypoint_index)]

    def decode_keypoint_index(self, keypoint_index: int) -> Tuple[int, int]:
        return self._keypoint_tables()[1][keypoint_index]

    def keypoint_owner_labels(self) -> Tuple[int, ...]:
        """Owning object label for each flat keypoint channel."""
        _, decode = self._keypoint_tables()
        return tuple(decode[i][0] for i in range(self.n_keypoints))

    def get_by_label(self, label: str) -> ObjectConfig:
        return self.configs[self.label_id_to_index[label]]

    # -- (de)serialization ----------------------------------------------
    def to_dict(self) -> dict:
        return {"object_configs": [c.to_dict() for c in self.configs]}

    @classmethod
    def from_dict(cls, data: dict) -> "ObjectConfigSet":
        return cls(
            configs=tuple(ObjectConfig.from_dict(d) for d in data["object_configs"])
        )

    def save(self, path: pathlib.Path):
        with open(path, "w") as fp:
            json.dump(self.to_dict(), fp, indent=2)

    @classmethod
    def load(cls, path: pathlib.Path) -> "ObjectConfigSet":
        with open(path) as fp:
            return cls.from_dict(json.load(fp))


def get_head_channels(object_config: ObjectConfigSet) -> Tuple[int, ...]:
    """Derive the per-head channel counts from the object config set, in the
    fixed head order the model emits (reference: centernet.py:114-142):

    heatmap, [kp heatmap, kp affinity], size, offset,
    [yaw bin, yaw offset], [pitch bin, pitch offset],
    [roll bin, roll offset], [depth].
    """
    channels = [object_config.n_labels]
    if object_config.train_keypoints:
        channels.extend((object_config.n_keypoints, 2 * object_config.n_keypoints))
    channels.extend((2, 2))
    if object_config.train_yaw:
        channels.extend((4, 4))
    if object_config.train_pitch:
        channels.extend((4, 4))
    if object_config.train_roll:
        channels.extend((4, 4))
    if object_config.train_depth:
        channels.append(1)
    return tuple(channels)
