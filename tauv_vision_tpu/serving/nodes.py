"""Host serving adapters — the ROS nodes' logic without ROS.

Parity targets: ``centernet/node/centernet_node.py`` and
``yolact/node/yolact_node.py``.  Everything the nodes do between
"received a color+depth frame pair" and "publish FeatureDetections" is
reproduced here against the fused TPU pipelines; transport (ROS, gRPC,
...) plugs in as callbacks so output parity is testable without ROS
(SURVEY.md §7 design decision).

Per-frame flow (centernet_node.py:77-206, yolact_node.py:98-218):
  batch frames -> fused preprocess+forward+decode on TPU -> depth-image z
  estimate (window mean for CenterNet, mask mean for YOLACT) -> pinhole
  back-projection -> camera-frame detections -> optional world-frame
  transform via a caller-provided pose lookup.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.configs.centernet import CenternetModelConfig, ObjectConfigSet
from tauv_vision_tpu.configs.yolact import ClassConfigSet, YolactModelConfig
from tauv_vision_tpu.serving.compiler import serving_jit
from tauv_vision_tpu.serving.pipeline import (
    back_project,
    depth_window_z,
    make_centernet_keypoint_pipeline,
    make_yolact_pipeline,
    mask_mean_z,
)


@dataclasses.dataclass
class FeatureDetection:
    """The tauv_msgs/FeatureDetection payload (camera or world frame)."""

    tag: str
    position: np.ndarray            # [3]
    orientation: Optional[np.ndarray] = None  # [3, 3] rotation
    confidence: float = 1.0
    SE2: bool = False


PoseLookup = Callable[[], Optional[np.ndarray]]  # -> [4, 4] world_t_cam
Publisher = Callable[[List[FeatureDetection]], None]


class CenternetServer:
    """CenterNet camera server (centernet_node.py:35-212)."""

    def __init__(
        self,
        model,
        variables,
        model_config: CenternetModelConfig,
        object_config: ObjectConfigSet,
        intrinsics: np.ndarray,
        n_detections: int = 10,
        keypoint_n_detections: int = 50,
        score_threshold: float = 0.6,
        keypoint_score_threshold: float = 0.3,
        depth_window: int = 5,
    ):
        self.model_config = model_config
        self.object_config = object_config
        self.intrinsics = jnp.asarray(intrinsics)
        self.variables = variables
        self.depth_window = depth_window

        # The node's dispatch is a top-level jit, so the tuned serving
        # compiler options (serving/compiler.py) apply here; the make_*
        # helpers return the raw traceable (jit=False) because options
        # are rejected on nested jits.
        self.pipeline = serving_jit(make_centernet_keypoint_pipeline(
            model, model_config, object_config, self.intrinsics,
            n_detections=n_detections,
            keypoint_n_detections=keypoint_n_detections,
            score_threshold=score_threshold,
            keypoint_score_threshold=keypoint_score_threshold,
            jit=False,
        ))

        # Warm-up forward pass (centernet_node.py:50).
        warmup = jnp.zeros((1, 480, 640, 3), jnp.uint8)
        self.pipeline(self.variables, warmup)

    def process(
        self,
        color: np.ndarray,            # [B, H, W, 3] uint8
        depth: Optional[np.ndarray],  # [B, H, W] meters or None
        pose_lookup: Optional[PoseLookup] = None,
        publish: Optional[Publisher] = None,
    ) -> List[List[FeatureDetection]]:
        frames = jnp.asarray(color)
        out = self.pipeline(self.variables, frames)
        det = out.detections

        b, k = np.asarray(det.valid).shape
        h, w = color.shape[1:3]

        if depth is not None:
            centers_px = np.stack(
                [
                    np.clip(np.asarray(det.y) * h, 0, h - 1).astype(np.int32),
                    np.clip(np.asarray(det.x) * w, 0, w - 1).astype(np.int32),
                ],
                axis=-1,
            )
            z = np.asarray(
                depth_window_z(
                    jnp.asarray(depth), jnp.asarray(centers_px),
                    self.depth_window,
                )
            )
        else:
            z = np.full((b, k), np.nan)

        world_t_cam = pose_lookup() if pose_lookup is not None else None

        points = np.asarray(
            back_project(
                jnp.asarray(np.asarray(det.y)),
                jnp.asarray(np.asarray(det.x)),
                jnp.asarray(np.nan_to_num(z, nan=1.0)),
                self.intrinsics,
                (h, w),
            )
        )

        pose_valid = np.asarray(out.pose_valid)
        pose_t = np.asarray(out.pose_translation)
        pose_r = np.asarray(out.pose_rotation)
        valid = np.asarray(det.valid)
        labels = np.asarray(det.label)
        scores = np.asarray(det.score)

        results: List[List[FeatureDetection]] = []
        for bi in range(b):
            sample: List[FeatureDetection] = []
            for ki in range(k):
                if not valid[bi, ki]:
                    continue
                tag = self.object_config.configs[int(labels[bi, ki])].id

                if pose_valid[bi, ki]:
                    position = pose_t[bi, ki]
                    orientation = pose_r[bi, ki]
                elif np.isfinite(z[bi, ki]):
                    position = points[bi, ki]
                    orientation = None
                else:
                    continue  # no depth and no PnP: drop (node behavior)

                if world_t_cam is not None:
                    position = (
                        world_t_cam[:3, :3] @ position + world_t_cam[:3, 3]
                    )
                    if orientation is not None:
                        orientation = world_t_cam[:3, :3] @ orientation

                sample.append(
                    FeatureDetection(
                        tag=tag,
                        position=position,
                        orientation=orientation,
                        confidence=float(scores[bi, ki]),
                    )
                )
            results.append(sample)
            if publish is not None:
                publish(sample)
        return results


class YolactServer:
    """YOLACT camera server (yolact_node.py:39-229)."""

    def __init__(
        self,
        model,
        variables,
        model_config: YolactModelConfig,
        class_config: ClassConfigSet,
        intrinsics: np.ndarray,
        top_k: int = 20,
        iou_threshold: float = 0.5,
        confidence_threshold: float = 0.5,
    ):
        self.model_config = model_config
        self.class_config = class_config
        self.intrinsics = jnp.asarray(intrinsics)
        self.variables = variables

        self.pipeline = serving_jit(make_yolact_pipeline(
            model, model_config, top_k=top_k, iou_threshold=iou_threshold,
            confidence_threshold=confidence_threshold, jit=False,
        ))

        # Double warm-up (yolact_node.py:52-64).
        warmup = jnp.zeros((1, 480, 640, 3), jnp.uint8)
        self.pipeline(self.variables, warmup)
        self.pipeline(self.variables, warmup)

    def process(
        self,
        color: np.ndarray,
        depth: Optional[np.ndarray],
        pose_lookup: Optional[PoseLookup] = None,
        publish: Optional[Publisher] = None,
    ) -> List[List[FeatureDetection]]:
        t0 = time.perf_counter()
        frames = jnp.asarray(color)
        out = self.pipeline(self.variables, frames)

        h, w = color.shape[1:3]
        b, k = np.asarray(out.valid).shape

        if depth is not None:
            # Masks at detection resolution -> resize depth query to mask
            # grid by nearest (z = nanmean(depth[mask > 0.5]),
            # yolact_node.py:184).
            mh, mw = out.mask.shape[2:]
            ys = (np.arange(mh) * (h / mh)).astype(np.int32)
            xs = (np.arange(mw) * (w / mw)).astype(np.int32)
            depth_small = depth[:, ys][:, :, xs]
            z = np.asarray(mask_mean_z(jnp.asarray(depth_small), out.mask))
        else:
            z = np.full((b, k), np.nan)

        box = np.asarray(out.box)
        points = np.asarray(
            back_project(
                jnp.asarray(box[..., 0]),
                jnp.asarray(box[..., 1]),
                jnp.asarray(np.nan_to_num(z, nan=1.0)),
                self.intrinsics,
                (h, w),
            )
        )

        world_t_cam = pose_lookup() if pose_lookup is not None else None
        valid = np.asarray(out.valid)
        labels = np.asarray(out.label)
        scores = np.asarray(out.score)

        results: List[List[FeatureDetection]] = []
        for bi in range(b):
            sample: List[FeatureDetection] = []
            for ki in range(k):
                if not valid[bi, ki] or not np.isfinite(z[bi, ki]):
                    continue
                cfg = self.class_config.get_by_index(int(labels[bi, ki]))
                position = points[bi, ki]
                if world_t_cam is not None:
                    position = (
                        world_t_cam[:3, :3] @ position + world_t_cam[:3, 3]
                    )
                sample.append(
                    FeatureDetection(
                        tag=cfg.id if cfg is not None else str(labels[bi, ki]),
                        position=position,
                        confidence=float(scores[bi, ki]),
                        SE2=False,
                    )
                )
            results.append(sample)
            if publish is not None:
                publish(sample)
        self.last_latency = time.perf_counter() - t0
        return results
