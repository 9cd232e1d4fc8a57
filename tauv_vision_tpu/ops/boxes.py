"""Canonical box math.

Boxes are ``(y, x, h, w)`` with values normalized to [0, 1], matching the
reference convention (``yolact/model/boxes.py``).  All functions are pure
jnp, shape-polymorphic over leading batch dims, and jit/vmap/grad-safe.

Behavioral parity targets (reference file:line):
- box_xy_swap            boxes.py:6-13
- box_to_corners         boxes.py:15-28
- corners_to_box         boxes.py:31-42
- box_encode/box_decode  boxes.py:45-61   (SSD-style with variances)
- iou_matrix             boxes.py:64-85
- box_to_mask            boxes.py:88-103  (vectorized here)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def box_xy_swap(box: jnp.ndarray) -> jnp.ndarray:
    """Swap (y, x, h, w) <-> (x, y, w, h) on the last axis."""
    return jnp.stack(
        (box[..., 1], box[..., 0], box[..., 3], box[..., 2]), axis=-1
    )


def box_to_corners(box: jnp.ndarray) -> jnp.ndarray:
    """(y, x, h, w) -> (min_y, min_x, max_y, max_x)."""
    cy, cx, h, w = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack(
        (cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2), axis=-1
    )


def corners_to_box(corners: jnp.ndarray) -> jnp.ndarray:
    """(min_y, min_x, max_y, max_x) -> (y, x, h, w)."""
    y0, x0, y1, x1 = (
        corners[..., 0],
        corners[..., 1],
        corners[..., 2],
        corners[..., 3],
    )
    return jnp.stack(
        ((y0 + y1) / 2, (x0 + x1) / 2, y1 - y0, x1 - x0), axis=-1
    )


def box_encode(
    box: jnp.ndarray, anchor: jnp.ndarray, variances: Tuple[float, float]
) -> jnp.ndarray:
    """SSD-style encoding of a box against an anchor.

    ``enc[:2] = (box_yx - anchor_yx) / (var0 * anchor_hw)``
    ``enc[2:] = log(box_hw / anchor_hw) / var1``
    """
    g_yx = (box[..., :2] - anchor[..., :2]) / (variances[0] * anchor[..., 2:])
    g_hw = jnp.log(box[..., 2:] / anchor[..., 2:]) / variances[1]
    return jnp.concatenate((g_yx, g_hw), axis=-1)


def box_decode(
    box_encoding: jnp.ndarray, anchor: jnp.ndarray, variances: Tuple[float, float]
) -> jnp.ndarray:
    """Inverse of :func:`box_encode`."""
    yx = anchor[..., :2] + box_encoding[..., :2] * variances[0] * anchor[..., 2:]
    hw = anchor[..., 2:] * jnp.exp(box_encoding[..., 2:] * variances[1])
    return jnp.concatenate((yx, hw), axis=-1)


def iou_matrix(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU.

    Args:
      box_a: [..., N, 4]
      box_b: [..., M, 4]
    Returns:
      [..., N, M] IoU matrix.
    """
    ca = box_to_corners(box_a)
    cb = box_to_corners(box_b)

    y_min = jnp.maximum(ca[..., :, None, 0], cb[..., None, :, 0])
    x_min = jnp.maximum(ca[..., :, None, 1], cb[..., None, :, 1])
    y_max = jnp.minimum(ca[..., :, None, 2], cb[..., None, :, 2])
    x_max = jnp.minimum(ca[..., :, None, 3], cb[..., None, :, 3])

    inter = jnp.clip(y_max - y_min, 0) * jnp.clip(x_max - x_min, 0)

    area_a = box_a[..., 2] * box_a[..., 3]
    area_b = box_b[..., 2] * box_b[..., 3]
    union = area_a[..., :, None] + area_b[..., None, :] - inter

    return inter / union


def box_to_mask(box: jnp.ndarray, img_size: Tuple[int, int]) -> jnp.ndarray:
    """Rasterize normalized boxes into binary masks.

    Vectorized over any leading dims (the reference rasterizes one box at a
    time; here a whole [..., 4] tensor maps to [..., H, W] in one shot so
    the op stays on-device inside the mask-loss / mask-assembly graphs).

    A pixel (integer grid coordinate) is inside when
    ``left <= x <= right and top <= y <= bottom`` in pixel units, matching
    the reference's >=/<= comparisons (boxes.py:99-100).
    """
    h_px, w_px = img_size
    y_coords = jnp.arange(h_px, dtype=jnp.float32)
    x_coords = jnp.arange(w_px, dtype=jnp.float32)

    cy = box[..., 0:1] * h_px
    cx = box[..., 1:2] * w_px
    bh = box[..., 2:3] * h_px
    bw = box[..., 3:4] * w_px

    top = cy - bh / 2
    bottom = cy + bh / 2
    left = cx - bw / 2
    right = cx + bw / 2

    in_y = (y_coords >= top) & (y_coords <= bottom)  # [..., H]
    in_x = (x_coords >= left) & (x_coords <= right)  # [..., W]

    return (in_y[..., :, None] & in_x[..., None, :]).astype(jnp.float32)


def box_clip(box: jnp.ndarray) -> jnp.ndarray:
    """Clamp a (y, x, h, w) box so its corners lie in [0, 1]."""
    corners = jnp.clip(box_to_corners(box), 0.0, 1.0)
    return corners_to_box(corners)
