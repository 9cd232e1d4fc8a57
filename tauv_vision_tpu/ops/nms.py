"""YOLACT Fast-NMS.

Parity target: ``yolact/model/nms.py:7-29``.

Pure matrix math (sort, upper-triangular pairwise IoU, column max) — the
form chosen by the YOLACT authors precisely because it has no sequential
dependency, which makes it ideal for TPU.  Differences from the reference:

- Batched: the reference indexes ``[0]`` and only works for batch size 1
  (nms.py:14-25); here everything is vmapped over the batch.
- Static shapes: instead of boolean-indexing a variable-length keep set,
  we return the sorted top-k candidate indices plus a keep mask; callers
  gather with the indices and apply the mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tauv_vision_tpu.ops.boxes import iou_matrix


def fast_nms(
    classification: jnp.ndarray,
    box: jnp.ndarray,
    top_k: int,
    iou_threshold: float,
    confidence_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast-NMS over decoded boxes.

    Args:
      classification: [B, N, C+1] class logits (channel 0 = background).
      box: [B, N, 4] decoded (y, x, h, w) boxes.
    Returns:
      keep_index: [B, top_k] int32 indices into N (confidence-sorted).
      keep: [B, top_k] bool mask of surviving detections.
    """
    confidence = jax.nn.softmax(classification, axis=-1)
    max_confidence = jnp.max(confidence[..., 1:], axis=-1)  # [B, N]

    top_conf, top_idx = jax.lax.top_k(max_confidence, top_k)  # [B, K]

    top_box = jnp.take_along_axis(box, top_idx[..., None], axis=1)  # [B, K, 4]

    iou = iou_matrix(top_box, top_box)  # [B, K, K]
    iou = jnp.triu(iou, k=1)
    iou_max = jnp.max(iou, axis=-2)  # column max: worst overlap w/ higher-conf box

    keep = (iou_max <= iou_threshold) & (top_conf >= confidence_threshold)
    return top_idx, keep
