"""YOLO-Pose loss + belief/affinity target rendering, vectorized.

Parity targets:
- create_belief / create_affinity   yolo_pose/model/model.py:71-108
- loss                              yolo_pose/model/loss.py:11-197

Differences from YOLACT's loss (which this shares structure with):
- box smooth-L1 is taken on *decoded* boxes (loss.py:64-74), not
  encodings;
- per-stage belief loss: class-balanced BCE with beta = 1 - mean(truth)
  (loss.py:160-162), on sigmoid(coeff x prototype) clamped to
  [1e-4, 1-1e-4];
- per-stage affinity loss: MSE of 2*(sigmoid(...) - 0.5) against the
  radius-limited unit-vector field (loss.py:164-171);
- the reference's mask-loss truth uses ``seg == classification`` (a bug
  vs YOLACT's ``seg == match_index``; rebuilt as match_index, the
  evident intent).
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig
from tauv_vision_tpu.models.yolo_pose import YoloPosePrediction
from tauv_vision_tpu.ops.boxes import box_decode, box_to_mask, iou_matrix
from tauv_vision_tpu.ops.image import resize_bilinear
from tauv_vision_tpu.ops.losses import binary_cross_entropy, softmax_cross_entropy


@flax.struct.dataclass
class YoloPoseTruth:
    valid: jnp.ndarray           # [B, M] bool
    classification: jnp.ndarray  # [B, M] int32
    box: jnp.ndarray             # [B, M, 4]
    seg_map: jnp.ndarray         # [B, in_h, in_w] int32 (object index)
    keypoints: jnp.ndarray       # [B, M, K, 2] (y, x) pixels at target res
    keypoint_valid: jnp.ndarray  # [B, M, K] bool
    centers: jnp.ndarray         # [B, M, 2] (y, x) pixels at target res


@flax.struct.dataclass
class YoloPoseLosses:
    total: jnp.ndarray
    classification: jnp.ndarray
    box: jnp.ndarray
    mask: jnp.ndarray
    belief: jnp.ndarray
    affinity: jnp.ndarray


def create_belief(
    size: Tuple[int, int], points: jnp.ndarray, point_valid: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Gaussian belief maps, one channel per keypoint
    (model.py:71-84, vectorized).  points: [..., K, 2] (y, x) in target
    pixels; returns [..., K, H, W]."""
    h, w = size
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    d2 = (
        (gy - points[..., 0][..., None, None]) ** 2
        + (gx - points[..., 1][..., None, None]) ** 2
    )
    belief = jnp.exp(-d2 / (2.0 * sigma**2))
    return belief * point_valid[..., None, None].astype(jnp.float32)


def create_affinity(
    size: Tuple[int, int], points: jnp.ndarray, point_valid: jnp.ndarray,
    center: jnp.ndarray, radius: float,
) -> jnp.ndarray:
    """Radius-limited unit-vector fields toward the object center
    (model.py:87-108, vectorized).  Returns [..., 2K, H, W] with (y, x)
    pairs interleaved per keypoint."""
    h, w = size
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")

    dy = points[..., 0][..., None, None] - gy  # [..., K, H, W]
    dx = points[..., 1][..., None, None] - gx
    dist = jnp.sqrt(dy**2 + dx**2)
    inside = (dist <= radius) & point_valid[..., None, None]

    vy = center[..., 0][..., None, None, None] - points[..., 0][..., None, None]
    vx = center[..., 1][..., None, None, None] - points[..., 1][..., None, None]
    norm = jnp.sqrt(vy**2 + vx**2)
    norm = jnp.where(norm > 0, norm, 1.0)
    uy = (vy / norm) * inside.astype(jnp.float32)
    ux = (vx / norm) * inside.astype(jnp.float32)

    # Interleave (y, x) per keypoint along the channel axis.
    stacked = jnp.stack((uy, ux), axis=-3)  # [..., K, 2, H, W]
    shape = stacked.shape
    return stacked.reshape(*shape[:-4], shape[-4] * 2, shape[-2], shape[-1])


def yolo_pose_loss(
    prediction: YoloPosePrediction,
    truth: YoloPoseTruth,
    config: YoloPoseModelConfig,
    max_positive_anchors: int = 16,
) -> YoloPoseLosses:
    cfg = config
    anchor = prediction.anchor

    iou = iou_matrix(anchor[None], truth.box)
    iou = iou * truth.valid[:, None, :].astype(jnp.float32)
    match_iou = jnp.max(iou, axis=2)
    match_index = jnp.argmax(iou, axis=2)

    positive = match_iou >= cfg.iou_pos_threshold
    negative = match_iou <= cfg.iou_neg_threshold
    n_pos = positive.sum()
    n_pos_f = jnp.maximum(n_pos.astype(jnp.float32), 1.0)

    # classification + OHEM (same as YOLACT).
    match_cls = jnp.take_along_axis(truth.classification, match_index, axis=1)
    match_cls = jnp.where(positive, match_cls, 0)
    ce = softmax_cross_entropy(prediction.classification, match_cls)
    bg_conf = jax.nn.softmax(prediction.classification, axis=-1)[..., 0]
    neg_scores = jnp.where(negative, -bg_conf, -jnp.inf)
    neg_rank = jnp.argsort(jnp.argsort(-neg_scores, axis=-1), axis=-1)
    k = cfg.negative_example_ratio * positive.sum(axis=1, keepdims=True)
    selected = positive | (negative & (neg_rank < k) & jnp.isfinite(neg_scores))
    selected = jax.lax.stop_gradient(selected)
    l_cls = (selected.astype(jnp.float32) * ce).sum() / (
        (1 + cfg.negative_example_ratio) * n_pos_f
    )

    # box smooth-L1 on decoded boxes (loss.py:64-74).
    box = box_decode(prediction.box_encoding, anchor[None], cfg.box_variances)
    matched_box = jnp.take_along_axis(truth.box, match_index[..., None], axis=1)
    diff = jnp.abs(box - matched_box)
    sl1 = jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
    l_box = (positive[..., None].astype(jnp.float32) * sl1).sum() / n_pos_f

    # mask + belief + affinity over capped positives, per sample.
    proto_h, proto_w = prediction.mask_prototype.shape[1:3]
    n_objects = truth.box.shape[1]

    def sample_losses(proto, coeffs, belief_protos, affinity_protos,
                      belief_coeff, affinity_coeff, pos, miou, midx,
                      boxes, seg, truth_belief, truth_affinity):
        obj_ids = jnp.arange(n_objects)
        inst = (seg[None] == obj_ids[:, None, None]).astype(jnp.float32)
        inst_resized = resize_bilinear(inst, (proto_h, proto_w))
        inst_area = inst_resized.sum(axis=(1, 2))

        pos_scores = jnp.where(pos, miou, -1.0)
        top_scores, top_anchor = jax.lax.top_k(pos_scores, max_positive_anchors)
        sel = top_scores > 0.0
        sel_obj = midx[top_anchor]

        # mask loss
        logits = jnp.einsum("kp,hwp->khw", coeffs[top_anchor], proto)
        pred_mask = jnp.clip(jax.nn.sigmoid(logits), 1e-4)
        truth_mask = inst_resized[sel_obj]
        bce = binary_cross_entropy(jnp.clip(pred_mask, 1e-4, 1 - 1e-4), truth_mask)
        crop = box_to_mask(boxes[sel_obj], (proto_h, proto_w))
        per = (crop * bce).sum(axis=(1, 2))
        area = inst_area[sel_obj]
        mask_sum = jnp.where(
            (area > 0) & sel, per / jnp.maximum(area, 1e-6), 0.0
        ).sum()

        # belief/affinity loss per stage.
        belief_sum = jnp.zeros(())
        affinity_sum = jnp.zeros(())
        for bproto, aproto in zip(belief_protos, affinity_protos):
            bh, bw = bproto.shape[0:2]
            tb = resize_bilinear(truth_belief[sel_obj], (bh, bw))  # [S, K, bh, bw]
            ta = resize_bilinear(truth_affinity[sel_obj], (bh, bw))

            bel = jnp.einsum(
                "skp,hwp->skhw", belief_coeff[top_anchor], bproto
            )
            bel = jnp.clip(jax.nn.sigmoid(bel), 1e-4, 1 - 1e-4)
            beta = 1.0 - tb.mean(axis=(-1, -2), keepdims=True)
            bce_map = (
                -beta * tb * jnp.log(bel)
                - (1.0 - beta) * (1.0 - tb) * jnp.log(1.0 - bel)
            )
            belief_sum = belief_sum + jnp.where(
                sel, bce_map.mean(axis=(1, 2, 3)), 0.0
            ).sum()

            aff = jnp.einsum(
                "skp,hwp->skhw", affinity_coeff[top_anchor], aproto
            )
            aff = 2.0 * (jnp.clip(jax.nn.sigmoid(aff), 1e-4) - 0.5)
            mse = (aff - ta) ** 2
            affinity_sum = affinity_sum + jnp.where(
                sel, mse.mean(axis=(1, 2, 3)), 0.0
            ).sum()

        return mask_sum, belief_sum, affinity_sum

    # Render per-object truth belief/affinity at the first prototype
    # stage's resolution (resized per stage inside the loss).
    bh, bw = prediction.belief_prototypes[0].shape[1:3]
    scale = jnp.asarray(
        [bh / truth.seg_map.shape[1], bw / truth.seg_map.shape[2]]
    )
    kp_scaled = truth.keypoints * scale
    centers_scaled = truth.centers * scale
    truth_belief = create_belief(
        (bh, bw), kp_scaled, truth.keypoint_valid, cfg.belief_sigma
    )  # [B, M, K, bh, bw]
    truth_affinity = create_affinity(
        (bh, bw), kp_scaled, truth.keypoint_valid, centers_scaled,
        cfg.affinity_radius,
    )  # [B, M, 2K, bh, bw]

    mask_sums, belief_sums, affinity_sums = jax.vmap(sample_losses)(
        prediction.mask_prototype, prediction.mask_coeff,
        prediction.belief_prototypes, prediction.affinity_prototypes,
        prediction.belief_coeff, prediction.affinity_coeff,
        positive, match_iou, match_index, truth.box, truth.seg_map,
        truth_belief, truth_affinity,
    )
    l_mask = mask_sums.sum() / n_pos_f
    l_belief = belief_sums.sum() / n_pos_f
    l_affinity = affinity_sums.sum() / n_pos_f

    total = l_cls + l_box + l_mask + l_belief + l_affinity
    return YoloPoseLosses(
        total=total, classification=l_cls, box=l_box, mask=l_mask,
        belief=l_belief, affinity=l_affinity,
    )
