"""Fused serving pipelines: uint8 camera frames -> decoded detections in
one jitted graph.

This is the TPU-native replacement for the ROS nodes' per-frame host
pipelines (centernet_node.py:90-116, yolact_node.py:106-135): resize +
normalize + forward + decode fuse into a single XLA program, so each
batch crosses host->HBM exactly once as uint8 and only the small decoded
tensors come back (the BASELINE.json north-star requirement).

3D localization from a depth image (depth-window / mask-mean z estimate +
pinhole back-projection, centernet_node.py:149-185, yolact_node.py:
177-193) is also provided as fused ops so a host adapter (ROS or
otherwise) only handles transport.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tauv_vision_tpu.configs.centernet import CenternetModelConfig, ObjectConfigSet
from tauv_vision_tpu.configs.yolact import YolactModelConfig
from tauv_vision_tpu.models.centernet import Centernet
from tauv_vision_tpu.models.yolact import Yolact
from tauv_vision_tpu.ops.image import preprocess
from tauv_vision_tpu.parallel.mesh import batch_sharding, replicated
from tauv_vision_tpu.serving.centernet_decode import (
    Detections,
    KeypointDetections,
    decode,
    decode_keypoints,
)
from tauv_vision_tpu.serving.yolact_decode import YolactDetections, decode_yolact

# ImageNet statistics, the constants both reference nodes normalize with.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STDDEV = (0.229, 0.224, 0.225)


def make_centernet_pipeline(
    model: Centernet,
    model_config: CenternetModelConfig,
    n_detections: int = 10,
    score_threshold: float = 0.6,
    dtype=jnp.bfloat16,
    jit: bool = True,
    mesh=None,
):
    """Returns jitted ``(variables, img_uint8 [B, H, W, 3]) -> Detections``.

    ``jit=False`` returns the raw traceable function (needed by the int8
    calibration pass, which must observe concrete activations).
    ``mesh`` enables data-parallel serving: the frame batch shards over
    the mesh's data axis, params replicate, and the decoded tensors come
    back batch-sharded."""

    def pipeline(variables, img_uint8) -> Detections:
        img = preprocess(
            img_uint8, (model_config.in_h, model_config.in_w),
            IMAGENET_MEAN, IMAGENET_STDDEV, dtype=dtype,
        )
        prediction = model.apply(variables, img, train=False)
        return decode(prediction, model_config, n_detections, score_threshold)

    if not jit:
        return pipeline
    if mesh is not None:
        return jax.jit(
            pipeline,
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh),
        )
    return jax.jit(pipeline)


def make_centernet_keypoint_pipeline(
    model: Centernet,
    model_config: CenternetModelConfig,
    object_config: ObjectConfigSet,
    projection_matrix,
    n_detections: int = 10,
    keypoint_n_detections: int = 50,
    score_threshold: float = 0.6,
    keypoint_score_threshold: float = 0.3,
    dtype=jnp.bfloat16,
    jit: bool = True,
):
    """Full keypoint+PnP pipeline (the centernet node's configuration,
    centernet_node.py:106-116).  ``jit=False`` returns the raw traceable
    function (for int8 calibration)."""
    projection_matrix = jnp.asarray(projection_matrix)

    def pipeline(variables, img_uint8) -> KeypointDetections:
        img = preprocess(
            img_uint8, (model_config.in_h, model_config.in_w),
            IMAGENET_MEAN, IMAGENET_STDDEV, dtype=dtype,
        )
        prediction = model.apply(variables, img, train=False)
        return decode_keypoints(
            prediction, model_config, object_config, projection_matrix,
            n_detections, keypoint_n_detections,
            score_threshold, keypoint_score_threshold,
        )

    return jax.jit(pipeline) if jit else pipeline


def make_yolo_pose_pipeline(
    model,
    model_config,
    top_k: int = 10,
    iou_threshold: float = 0.5,
    confidence_threshold: float = 0.5,
    keypoint_score_threshold: float = 0.3,
    object_points=None,
    camera_matrix=None,
    dtype=jnp.bfloat16,
    jit: bool = True,
    split_pnp="auto",
):
    """Fused YOLO-Pose serving pipeline: uint8 frames -> belief-peak
    keypoints (+ optional PnP pose).  Completes the reference's empty
    ``yolo_pose/model/inference.py`` as a servable path; ``jit=False``
    returns the raw traceable function (for int8 calibration).

    ``split_pnp`` controls whether PnP fuses into the same program as
    the model+decode or runs as its own dispatch over the decoded
    keypoint tensors: "auto" (default) probes the runtime once
    (serving/runtime_probe.fused_pnp_supported — the fused composition
    crashes some TPU runtimes), True forces the split, False forces
    fusion.  Only meaningful when ``jit=True`` and PnP is requested;
    the split costs one extra dispatch of a few-KB tensors.
    """
    from tauv_vision_tpu.serving.yolo_pose_decode import (
        attach_pnp,
        decode_yolo_pose,
    )

    if object_points is not None:
        object_points = jnp.asarray(object_points)
    if camera_matrix is not None:
        camera_matrix = jnp.asarray(camera_matrix)

    want_pnp = object_points is not None and camera_matrix is not None

    def make(fuse_pnp: bool):
        def pipeline(variables, img_uint8):
            img = preprocess(
                img_uint8, (model_config.in_h, model_config.in_w),
                IMAGENET_MEAN, IMAGENET_STDDEV, dtype=dtype,
            )
            prediction = model.apply(variables, img, train=False)
            return decode_yolo_pose(
                prediction, model_config, top_k, iou_threshold,
                confidence_threshold, keypoint_score_threshold,
                object_points=object_points if fuse_pnp else None,
                camera_matrix=camera_matrix if fuse_pnp else None,
            )

        return pipeline

    if not jit:
        return make(want_pnp)

    split = False
    if want_pnp:
        if split_pnp == "auto":
            from tauv_vision_tpu.serving.runtime_probe import (
                fused_pnp_supported,
            )

            split = not fused_pnp_supported()
        else:
            split = bool(split_pnp)

    if not split:
        return jax.jit(make(want_pnp))

    base = jax.jit(make(False))
    pnp_fn = jax.jit(
        lambda d: attach_pnp(
            d, model_config, object_points, camera_matrix,
            keypoint_score_threshold,
        )
    )

    def split_pipeline(variables, img_uint8):
        return pnp_fn(base(variables, img_uint8))

    return split_pipeline


def make_yolact_pipeline(
    model: Yolact,
    model_config: YolactModelConfig,
    top_k: int = 20,
    iou_threshold: float = 0.5,
    confidence_threshold: float = 0.5,
    mask_hw: Optional[Tuple[int, int]] = None,
    dtype=jnp.bfloat16,
    jit: bool = True,
    mesh=None,
):
    """Returns jitted ``(variables, img_uint8) -> YolactDetections``.

    ``jit=False`` returns the raw traceable function (for calibration);
    ``mesh`` enables data-parallel serving (batch sharded, params
    replicated)."""

    def pipeline(variables, img_uint8) -> YolactDetections:
        img = preprocess(
            img_uint8, (model_config.in_h, model_config.in_w),
            model_config.img_mean, model_config.img_stddev, dtype=dtype,
        )
        prediction = model.apply(variables, img, train=False)
        return decode_yolact(
            prediction, model_config, top_k, iou_threshold,
            confidence_threshold, mask_hw=mask_hw,
        )

    if not jit:
        return pipeline
    if mesh is not None:
        return jax.jit(
            pipeline,
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh),
        )
    return jax.jit(pipeline)


@functools.partial(jax.jit, static_argnums=(2,))
def depth_window_z(
    depth_img: jnp.ndarray, centers_px: jnp.ndarray, window: int = 5
) -> jnp.ndarray:
    """Mean of valid depths in a window around each center
    (centernet_node.py:149-178).

    Args:
      depth_img: [B, H, W] depth in meters (0/NaN = invalid).
      centers_px: [B, K, 2] integer (y, x) pixel centers.
    Returns: [B, K] z estimates (NaN when no valid depth in window).
    """
    b, h, w = depth_img.shape
    half = window // 2
    offs = jnp.arange(-half, half + 1)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")

    ys = jnp.clip(centers_px[..., 0:1] + oy.reshape(-1), 0, h - 1)  # [B, K, W2]
    xs = jnp.clip(centers_px[..., 1:2] + ox.reshape(-1), 0, w - 1)
    flat = depth_img.reshape(b, h * w)
    vals = jnp.take_along_axis(
        flat[:, None, :], ys * w + xs, axis=2
    )  # [B, K, W2]
    valid = jnp.isfinite(vals) & (vals > 0)
    count = valid.sum(-1)
    mean = jnp.where(valid, vals, 0.0).sum(-1) / jnp.maximum(count, 1)
    return jnp.where(count > 0, mean, jnp.nan)


@jax.jit
def mask_mean_z(depth_img: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Mean depth inside each detection mask (yolact_node.py:184):
    z = nanmean(depth[mask > 0.5]).

    Args:
      depth_img: [B, H, W]; masks: [B, K, H, W].
    Returns: [B, K].
    """
    inside = (masks > 0.5) & jnp.isfinite(depth_img)[:, None] & (
        depth_img[:, None] > 0
    )
    count = inside.sum((-1, -2))
    total = jnp.where(inside, depth_img[:, None], 0.0).sum((-1, -2))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), jnp.nan)


@jax.jit
def back_project(
    y_norm: jnp.ndarray,
    x_norm: jnp.ndarray,
    z: jnp.ndarray,
    intrinsics: jnp.ndarray,
    img_hw: Tuple[int, int] | jnp.ndarray,
) -> jnp.ndarray:
    """Pinhole back-projection of normalized image coords + depth to a 3D
    camera-frame point (yolact_node.py:192-193, centernet_node.py:180-185).

    Returns [..., 3] (x, y, z) camera-frame points.
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    h, w = img_hw[0], img_hw[1]
    u = x_norm * w
    v = y_norm * h
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    return jnp.stack((x, y, z), axis=-1)


def make_combined_pipeline(
    cn_forward,
    cn_model_config: CenternetModelConfig,
    yl_forward,
    yl_model_config,
    n_detections: int = 10,
    score_threshold: float = 0.6,
    top_k: int = 20,
    iou_threshold: float = 0.5,
    confidence_threshold: float = 0.5,
    dtype=jnp.bfloat16,
    jit: bool = True,
):
    """Both serving nets on ONE camera batch in ONE jitted graph.

    The deployed system runs both detector nodes on the same camera
    topics (centernet_node.py:62-63, yolact_node.py:74-84), so the
    production-shaped serving graph shares the 640x480 -> 640x360
    bilinear resize between them, normalizes per-model, and runs both
    forwards + decodes under a single dispatch.  The resize math is
    ops/image.preprocess's (resize in [0, 255] float space, then
    normalize), so decoded outputs are BIT-IDENTICAL to the separate
    per-model pipelines; fusing removes the duplicated resize and lets
    XLA schedule the two nets' gaps against each other.

    ``cn_forward(img) -> Prediction`` and ``yl_forward(img) ->
    YolactPrediction`` take normalized inputs (e.g. the chain-int8
    forwards from serving/quantize_chain.py, or ``model.apply``
    closures).  Returns ``fn(img_uint8) -> (Detections,
    YolactDetections)``.
    """
    from tauv_vision_tpu.ops.image import normalize_image, resize_bilinear
    from tauv_vision_tpu.serving.yolact_decode import decode_yolact

    assert (cn_model_config.in_h, cn_model_config.in_w) == (
        yl_model_config.in_h, yl_model_config.in_w,
    ), "shared-resize fusion needs matching input sizes"
    out_hw = (cn_model_config.in_h, cn_model_config.in_w)

    def pipeline(img_uint8):
        img = img_uint8.astype(jnp.float32)
        img = jnp.moveaxis(img, -1, -3)
        img = resize_bilinear(img, out_hw)
        img = jnp.moveaxis(img, -3, -1)  # [..., H, W, C] in [0, 255]
        cn_in = normalize_image(img, IMAGENET_MEAN, IMAGENET_STDDEV,
                                dtype=dtype)
        yl_in = normalize_image(img, yl_model_config.img_mean,
                                yl_model_config.img_stddev, dtype=dtype)
        cn_dets = decode(cn_forward(cn_in), cn_model_config,
                         n_detections, score_threshold)
        yl_dets = decode_yolact(yl_forward(yl_in), yl_model_config,
                                top_k, iou_threshold, confidence_threshold)
        return cn_dets, yl_dets

    return jax.jit(pipeline) if jit else pipeline
