"""YOLACT inference postprocess: box decode -> Fast-NMS -> mask assembly.

Parity target: the node postprocess chain ``yolact/node/yolact_node.py:
127-135`` (box_decode -> nms -> assemble_mask -> upsample) and
``yolact/scripts/evaluate_batch.py:55-146``, with static top-k outputs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from tauv_vision_tpu.configs.yolact import YolactModelConfig
from tauv_vision_tpu.models.yolact import YolactPrediction
from tauv_vision_tpu.ops.boxes import box_decode
from tauv_vision_tpu.ops.image import resize_bilinear
from tauv_vision_tpu.ops.masks import assemble_mask_batch
from tauv_vision_tpu.ops.nms import fast_nms


@flax.struct.dataclass
class YolactDetections:
    valid: jnp.ndarray    # [B, K] bool
    score: jnp.ndarray    # [B, K] max non-background confidence
    label: jnp.ndarray    # [B, K] int32 argmax class (1..C)
    box: jnp.ndarray      # [B, K, 4] decoded (y, x, h, w)
    mask: jnp.ndarray     # [B, K, mh, mw] in [0, 1]


def decode_yolact(
    prediction: YolactPrediction,
    config: YolactModelConfig,
    top_k: int,
    iou_threshold: float,
    confidence_threshold: float,
    mask_hw: Optional[Tuple[int, int]] = None,
    crop_masks: bool = True,
) -> YolactDetections:
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
    sel_coeff = jnp.take_along_axis(
        prediction.mask_coeff, keep_index[..., None], axis=1
    )

    confidence = jax.nn.softmax(sel_cls, axis=-1)
    score = jnp.max(confidence[..., 1:], axis=-1)
    label = jnp.argmax(confidence[..., 1:], axis=-1).astype(jnp.int32) + 1

    proto = jnp.moveaxis(prediction.mask_prototype, -1, 1)  # [B, P, h, w]
    masks = assemble_mask_batch(
        proto, sel_coeff, sel_box if crop_masks else None
    )  # [B, K, h, w]

    if mask_hw is not None:
        masks = resize_bilinear(masks, mask_hw)

    return YolactDetections(
        valid=keep, score=score, label=label, box=sel_box, mask=masks
    )
