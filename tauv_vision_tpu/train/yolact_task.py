"""YOLACT loss, fully vectorized and jit-safe.

Parity target: ``yolact/model/loss.py:8-124``:
- anchor<->truth IoU matching with pos/neg thresholds;
- OHEM hard-negative mining at ``negative_example_ratio``:1 picked by
  background confidence (vectorized with a rank computation instead of a
  per-sample dynamic-k topk);
- class CE normalized by ``(1+ratio) * n_pos``;
- box smooth-L1 on encodings against ``box_encode`` of the matched truth;
- per-positive-anchor mask assembly BCE against the instance mask
  (``seg == match_index``) bilinear-resized to prototype resolution,
  cropped by the truth-box raster and the 254-invalid-region mask,
  normalized by the resized truth-mask area.

TPU-first deviations (documented, config-controlled):
- mask loss: with ``max_positive_anchors=None`` it is EXACT — every
  anchor's mask loss is computed in static-shape chunks (``lax.map``)
  and masked by positivity, matching the reference's dynamic loop over
  all positives (``yolact/model/loss.py:75-120``).  With an integer cap
  it runs over the IoU-top-k positives only (cheaper; static shapes) and
  reports ``mask_clipped`` — the number of positives dropped by the cap
  — so a binding cap is observable instead of silent.
- the per-object instance masks are resized once per object (max_objects
  of them) and gathered per anchor, instead of re-resizing per positive
  anchor.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from tauv_vision_tpu.configs.yolact import YolactModelConfig, YolactTrainConfig
from tauv_vision_tpu.models.yolact import YolactPrediction
from tauv_vision_tpu.ops.boxes import box_encode, box_to_mask, iou_matrix
from tauv_vision_tpu.ops.image import resize_bilinear, resize_nearest
from tauv_vision_tpu.ops.losses import binary_cross_entropy, softmax_cross_entropy

INVALID_SEG = 254
BACKGROUND_SEG = 255


@flax.struct.dataclass
class YolactTruth:
    """Padded, static-shape truth batch (reference tuple order:
    loss.py:10 — valid, classification, box, seg_map, img_valid)."""

    valid: jnp.ndarray           # [B, M] bool
    classification: jnp.ndarray  # [B, M] int32 (1..n_classes; 0 unused)
    box: jnp.ndarray             # [B, M, 4] normalized (y, x, h, w)
    seg_map: jnp.ndarray         # [B, in_h, in_w] int32 object index / 254 / 255
    img_valid: jnp.ndarray       # [B, in_h, in_w] bool


@flax.struct.dataclass
class YolactLosses:
    total: jnp.ndarray
    classification: jnp.ndarray
    box: jnp.ndarray
    mask: jnp.ndarray
    # positives dropped by the max_positive_anchors cap this step (0 when
    # the cap is None/not binding) — surfaced so a binding cap is loud.
    mask_clipped: jnp.ndarray = flax.struct.field(default=0.0)


def _rank_desc(scores: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = position of element i in a descending sort of scores
    (double argsort; ties broken by index like torch.topk)."""
    return jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)


def yolact_loss(
    prediction: YolactPrediction,
    truth: YolactTruth,
    model_config: YolactModelConfig,
    train_config: YolactTrainConfig,
) -> YolactLosses:
    cfg = model_config
    classification = prediction.classification  # [B, A, C+1]
    box_encoding = prediction.box_encoding      # [B, A, 4]
    mask_coeff = prediction.mask_coeff          # [B, A, P]
    anchor = prediction.anchor                  # [A, 4]
    prototype = prediction.mask_prototype       # [B, h, w, P]

    b, a, _ = classification.shape

    iou = iou_matrix(anchor[None], truth.box)   # [B, A, M]
    iou = iou * truth.valid[:, None, :].astype(jnp.float32)
    match_iou = jnp.max(iou, axis=2)            # [B, A]
    match_index = jnp.argmax(iou, axis=2)       # [B, A]

    positive = match_iou >= cfg.iou_pos_threshold
    negative = match_iou <= cfg.iou_neg_threshold

    n_pos = positive.sum()
    n_pos_f = n_pos.astype(jnp.float32)

    # ---- classification with OHEM ------------------------------------
    match_cls = jnp.take_along_axis(truth.classification, match_index, axis=1)
    match_cls = jnp.where(positive, match_cls, 0)  # background for non-pos

    ce = softmax_cross_entropy(classification, match_cls)  # [B, A]

    bg_conf = jax.nn.softmax(classification, axis=-1)[..., 0]
    neg_scores = jnp.where(negative, -bg_conf, -jnp.inf)
    # rank of each anchor among the sample's negatives, hardest first
    neg_rank = _rank_desc(neg_scores)
    k = cfg.negative_example_ratio * positive.sum(axis=1, keepdims=True)  # [B, 1]
    selected_neg = negative & (neg_rank < k) & jnp.isfinite(neg_scores)

    selected = positive | selected_neg
    selected = jax.lax.stop_gradient(selected)

    cls_sum = (selected.astype(jnp.float32) * ce).sum()
    l_cls = jnp.where(
        n_pos > 0,
        cls_sum / ((1 + cfg.negative_example_ratio) * jnp.maximum(n_pos_f, 1.0)),
        cls_sum,
    )

    # ---- box regression ----------------------------------------------
    matched_box = jnp.take_along_axis(
        truth.box, match_index[..., None], axis=1
    )  # [B, A, 4]
    anchor_b = jnp.broadcast_to(anchor[None], matched_box.shape)
    # Avoid log(0) on padded truth: replace non-positive rows by the anchor
    # itself (encodes to zeros) before masking.
    safe_box = jnp.where(positive[..., None], matched_box, anchor_b)
    enc_target = box_encode(safe_box, anchor_b, cfg.box_variances)

    diff = jnp.abs(box_encoding - enc_target)
    sl1 = jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
    box_sum = (positive[..., None].astype(jnp.float32) * sl1).sum()
    l_box = jnp.where(n_pos > 0, box_sum / jnp.maximum(n_pos_f, 1.0), box_sum)

    # ---- mask loss ----------------------------------------------------
    proto_h, proto_w = prototype.shape[1:3]
    n_objects = truth.box.shape[1]
    k_cap = train_config.max_positive_anchors

    def anchor_set_loss(
        proto, coeff_k, obj_k, sel_k, inst_resized, inst_area, valid_resized,
        boxes,
    ):
        """Summed cropped/normalized mask BCE over one static anchor set
        (coeff_k: [K, P], obj_k/sel_k: [K])."""
        logits = jnp.einsum("kp,hwp->khw", coeff_k, proto)
        pred_mask = jnp.clip(jax.nn.sigmoid(logits), 1e-4, 1 - 1e-4)

        truth_mask = inst_resized[obj_k]             # [K, h, w]
        truth_area = inst_area[obj_k]                # [K]

        bce = binary_cross_entropy(pred_mask, truth_mask)
        crop = box_to_mask(boxes[obj_k], (proto_h, proto_w)) * valid_resized

        per_anchor = (crop * bce).sum(axis=(1, 2))
        per_anchor = jnp.where(
            (truth_area > 0) & sel_k,
            per_anchor / jnp.maximum(truth_area, 1e-6),
            0.0,
        )
        return per_anchor.sum()

    def sample_mask_loss(
        proto, coeffs, pos, miou, midx, boxes, seg, img_valid
    ):
        # proto: [h, w, P]; coeffs: [A, P]; seg: [in_h, in_w]
        # Per-object resized truth masks: [M, h, w].
        obj_ids = jnp.arange(n_objects)
        inst = (seg[None] == obj_ids[:, None, None]).astype(jnp.float32)
        inst_resized = resize_bilinear(inst, (proto_h, proto_w))
        inst_area = inst_resized.sum(axis=(1, 2))  # [M]

        valid_resized = resize_nearest(
            img_valid.astype(jnp.float32)[None], (proto_h, proto_w)
        )[0]

        if k_cap is None:
            # EXACT: every anchor, in static chunks, masked by positivity
            # (reference semantics: loss over all positives).
            chunk = min(256, a)
            pad = (-a) % chunk
            coeffs_p = jnp.pad(coeffs, ((0, pad), (0, 0)))
            sel_p = jnp.pad(pos, (0, pad))
            obj_p = jnp.pad(midx, (0, pad))
            p_dim = coeffs.shape[-1]

            def chunk_fn(args):
                c, s, o = args
                return anchor_set_loss(
                    proto, c, o, s, inst_resized, inst_area, valid_resized,
                    boxes,
                )

            sums = jax.lax.map(chunk_fn, (
                coeffs_p.reshape(-1, chunk, p_dim),
                sel_p.reshape(-1, chunk),
                obj_p.reshape(-1, chunk),
            ))
            return sums.sum(), jnp.zeros((), jnp.int32)

        # CAPPED: top-k positive anchors by match IoU (static cap);
        # report how many positives the cap dropped.
        pos_scores = jnp.where(pos, miou, -1.0)
        top_scores, top_anchor = jax.lax.top_k(pos_scores, k_cap)
        sel = top_scores > 0.0  # really positive

        loss_sum = anchor_set_loss(
            proto, coeffs[top_anchor], midx[top_anchor], sel,
            inst_resized, inst_area, valid_resized, boxes,
        )
        clipped = jnp.maximum(
            pos.sum().astype(jnp.int32) - jnp.int32(k_cap), 0
        )
        return loss_sum, clipped

    mask_sums, clipped_counts = jax.vmap(sample_mask_loss)(
        prototype, mask_coeff, positive, match_iou, match_index,
        truth.box, truth.seg_map, truth.img_valid,
    )
    mask_sum = mask_sums.sum()
    l_mask = jnp.where(n_pos > 0, mask_sum / jnp.maximum(n_pos_f, 1.0), mask_sum)

    total = l_cls + l_box + l_mask
    return YolactLosses(
        total=total, classification=l_cls, box=l_box, mask=l_mask,
        mask_clipped=clipped_counts.sum(),
    )
