"""YOLO-Pose inference decode.

The reference never implemented this (``yolo_pose/model/inference.py`` is
an empty file; SURVEY.md §2.3) — this is the evident intent completed:

  box decode -> Fast-NMS -> assemble per-detection belief maps from the
  final-stage prototypes -> per-channel peak extraction -> PnP on the
  recovered keypoints.

Static shapes throughout; PnP is the pure-JAX LM solver.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig
from tauv_vision_tpu.models.yolo_pose import YoloPosePrediction
from tauv_vision_tpu.ops.boxes import box_decode
from tauv_vision_tpu.ops.nms import fast_nms
from tauv_vision_tpu.ops.pnp import solve_pnp_batch


@flax.struct.dataclass
class YoloPoseDetections:
    valid: jnp.ndarray            # [B, K] bool
    score: jnp.ndarray            # [B, K]
    label: jnp.ndarray            # [B, K] int32
    box: jnp.ndarray              # [B, K, 4]
    belief: jnp.ndarray           # [B, K, Kp, bh, bw] assembled belief maps
    keypoint_y: jnp.ndarray       # [B, K, Kp] normalized
    keypoint_x: jnp.ndarray       # [B, K, Kp]
    keypoint_score: jnp.ndarray   # [B, K, Kp]
    pose_valid: Optional[jnp.ndarray] = None        # [B, K]
    pose_rotation: Optional[jnp.ndarray] = None     # [B, K, 3, 3]
    pose_translation: Optional[jnp.ndarray] = None  # [B, K, 3]


def decode_yolo_pose(
    prediction: YoloPosePrediction,
    config: YoloPoseModelConfig,
    top_k: int,
    iou_threshold: float,
    confidence_threshold: float,
    keypoint_score_threshold: float = 0.3,
    object_points: Optional[jnp.ndarray] = None,   # [Kp, 3] model points
    camera_matrix: Optional[jnp.ndarray] = None,   # [3, 3]
    pnp_iterations: int = 20,
) -> YoloPoseDetections:
    box = box_decode(
        prediction.box_encoding, prediction.anchor[None], config.box_variances
    )
    keep_index, keep = fast_nms(
        prediction.classification, box, top_k, iou_threshold,
        confidence_threshold,
    )

    sel_box = jnp.take_along_axis(box, keep_index[..., None], axis=1)
    sel_cls = jnp.take_along_axis(
        prediction.classification, keep_index[..., None], axis=1
    )
    sel_belief_coeff = jnp.take_along_axis(
        prediction.belief_coeff, keep_index[..., None, None], axis=1
    )  # [B, K, Kp, Pb]

    confidence = jax.nn.softmax(sel_cls, axis=-1)
    score = jnp.max(confidence[..., 1:], axis=-1)
    label = jnp.argmax(confidence[..., 1:], axis=-1).astype(jnp.int32) + 1

    # Assemble belief maps from the final cascade stage
    # (DOPE uses the last stage's output at inference).
    proto = prediction.belief_prototypes[-1]  # [B, bh, bw, Pb]
    belief = jax.nn.sigmoid(
        jnp.einsum(
            "bkqp,bhwp->bkqhw", sel_belief_coeff, proto,
            preferred_element_type=jnp.float32,
        )
    )  # [B, K, Kp, bh, bw]

    bh, bw = belief.shape[-2:]
    flat = belief.reshape(*belief.shape[:-2], bh * bw)
    kp_score = jnp.max(flat, axis=-1)
    kp_idx = jnp.argmax(flat, axis=-1)
    kp_y = (kp_idx // bw).astype(jnp.float32) / bh
    kp_x = (kp_idx % bw).astype(jnp.float32) / bw

    pose_valid = pose_rotation = pose_translation = None
    if object_points is not None and camera_matrix is not None:
        pose_valid, pose_rotation, pose_translation = _solve_poses(
            kp_y, kp_x, kp_score, keep, config, object_points,
            camera_matrix, keypoint_score_threshold, pnp_iterations,
        )

    return YoloPoseDetections(
        valid=keep,
        score=score,
        label=label,
        box=sel_box,
        belief=belief,
        keypoint_y=kp_y,
        keypoint_x=kp_x,
        keypoint_score=kp_score,
        pose_valid=pose_valid,
        pose_rotation=pose_rotation,
        pose_translation=pose_translation,
    )


def _solve_poses(kp_y, kp_x, kp_score, keep, config, object_points,
                 camera_matrix, keypoint_score_threshold, pnp_iterations):
    """Batched LM PnP over recovered keypoints (shared by the fused
    decode above and the split dispatch below)."""
    b, k, n_kp = kp_score.shape
    image_points = jnp.stack(
        (kp_x * config.in_w, kp_y * config.in_h), axis=-1
    )  # (u, v) px
    mask = kp_score >= keypoint_score_threshold
    obj = jnp.broadcast_to(object_points[None, None], (b, k, n_kp, 3))
    result = solve_pnp_batch(
        obj.reshape(b * k, n_kp, 3),
        image_points.reshape(b * k, n_kp, 2),
        camera_matrix,
        mask.reshape(b * k, n_kp),
        n_iterations=pnp_iterations,
        min_points=4,
    )
    return (
        result.valid.reshape(b, k) & keep,
        result.rotation.reshape(b, k, 3, 3),
        result.translation.reshape(b, k, 3),
    )


def attach_pnp(
    detections: YoloPoseDetections,
    config: YoloPoseModelConfig,
    object_points: jnp.ndarray,
    camera_matrix: jnp.ndarray,
    keypoint_score_threshold: float = 0.3,
    pnp_iterations: int = 20,
) -> YoloPoseDetections:
    """PnP as its own dispatch over already-decoded detections.

    On runtimes where the fully fused YOLO-Pose graph with in-graph PnP
    is unstable (serving/runtime_probe.py), serving decodes without
    object points and runs this jitted separately — the same math as
    the fused branch, split at the keypoint tensors (a few KB crossing
    the dispatch boundary)."""
    pose_valid, pose_rotation, pose_translation = _solve_poses(
        detections.keypoint_y, detections.keypoint_x,
        detections.keypoint_score, detections.valid, config,
        jnp.asarray(object_points), jnp.asarray(camera_matrix),
        keypoint_score_threshold, pnp_iterations,
    )
    return detections.replace(
        pose_valid=pose_valid,
        pose_rotation=pose_rotation,
        pose_translation=pose_translation,
    )
