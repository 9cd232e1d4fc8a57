"""Gaussian heatmap / keypoint-affinity target rendering, vectorized.

Parity targets:
- generate_heatmap           centernet/model/loss.py:31-72
- generate_keypoint_heatmap  centernet/model/loss.py:75-135
- out_index_for_position     centernet/model/loss.py:138-142

The reference splats one full-resolution Gaussian per object inside a
Python double loop (O(B*N) kernel launches).  Here the whole batch is a
single broadcasted computation: since all objects share one sigma,
``max_n exp(-d_n^2 / 2s^2) == exp(-min_n d_n^2 / 2s^2)``, so rendering a
class's heatmap reduces to a min-of-squared-distances over that class's
(padded, masked) objects — one fused XLA reduction, no scatter.

All inputs are padded to a static ``n_objects`` with a validity mask, the
layout the reference's own collate function anticipates
(``datasets/load/pose_dataset.py:278-354``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_BIG = 1e30


def splat_grid(out_h: int, out_w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integer (y, x) coordinate grids, each [out_h, out_w] float32."""
    y = jnp.arange(out_h, dtype=jnp.float32)
    x = jnp.arange(out_w, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    return yy, xx


def generate_heatmap(
    center: jnp.ndarray,
    label: jnp.ndarray,
    valid: jnp.ndarray,
    n_labels: int,
    in_h: int,
    in_w: int,
    downsample_ratio: int,
    sigma: float,
) -> jnp.ndarray:
    """Render per-class center heatmaps.

    Args:
      center: [B, N, 2] normalized (y, x) object centers.
      label:  [B, N] int class labels.
      valid:  [B, N] bool.
    Returns:
      [B, n_labels, out_h, out_w] float32 heatmap in [0, 1].
    """
    out_h = int(in_h // downsample_ratio)
    out_w = int(in_w // downsample_ratio)
    sigma = max(float(sigma), 0.1)  # reference's tiny-sigma guard (loss.py:60-62)

    yy, xx = splat_grid(out_h, out_w)

    # Match the reference's floor(center * in / ratio) cell snapping.
    cy = jnp.floor(center[..., 0] * in_h / downsample_ratio)  # [B, N]
    cx = jnp.floor(center[..., 1] * in_w / downsample_ratio)

    d2 = (
        (xx[None, None] - cx[..., None, None]) ** 2
        + (yy[None, None] - cy[..., None, None]) ** 2
    )  # [B, N, H, W]
    d2 = jnp.where(valid[..., None, None], d2, _BIG)

    heatmaps = []
    for class_i in range(n_labels):
        class_d2 = jnp.where((label == class_i)[..., None, None], d2, _BIG)
        min_d2 = jnp.min(class_d2, axis=1)  # [B, H, W]
        heatmaps.append(jnp.exp(-min_d2 / (2.0 * sigma**2)))

    return jnp.stack(heatmaps, axis=1)


def generate_keypoint_heatmap(
    keypoint_center: jnp.ndarray,
    keypoint_label: jnp.ndarray,
    keypoint_valid: jnp.ndarray,
    keypoint_object_index: jnp.ndarray,
    object_center: jnp.ndarray,
    n_keypoints: int,
    in_h: int,
    in_w: int,
    downsample_ratio: int,
    heatmap_sigma: float,
    affinity_sigma: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render keypoint heatmaps + affinity-weight maps + affinity fields.

    The affinity field at a pixel is the unit vector from the *owning
    object's* center to the pixel (in normalized grid coordinates), taken
    from whichever keypoint instance of that channel has the nearest owner
    center ("nearest keypoint wins", reference loss.py:114-128).

    Args:
      keypoint_center:       [B, K, 2] normalized (y, x) keypoint positions.
      keypoint_label:        [B, K] flat keypoint channel indices.
      keypoint_valid:        [B, K] bool.
      keypoint_object_index: [B, K] index into the object axis.
      object_center:         [B, N, 2] normalized object centers.
    Returns:
      heatmap:         [B, n_keypoints, out_h, out_w]
      affinity_weight: [B, n_keypoints, out_h, out_w]
      affinity:        [B, n_keypoints, 2, out_h, out_w]
    """
    out_h = int(in_h // downsample_ratio)
    out_w = int(in_w // downsample_ratio)

    yy, xx = splat_grid(out_h, out_w)

    cy = jnp.floor(keypoint_center[..., 0] * in_h / downsample_ratio)  # [B, K]
    cx = jnp.floor(keypoint_center[..., 1] * in_w / downsample_ratio)

    d2 = (
        (xx[None, None] - cx[..., None, None]) ** 2
        + (yy[None, None] - cy[..., None, None]) ** 2
    )  # [B, K, H, W]
    d2 = jnp.where(keypoint_valid[..., None, None], d2, _BIG)

    # Owner-center distance field per keypoint instance, in normalized
    # (y / out_h, x / out_w) coordinates (reference loss.py:114).
    owner_center = jnp.take_along_axis(
        object_center, keypoint_object_index[..., None], axis=1
    )  # [B, K, 2]
    dy = yy[None, None] / out_h - owner_center[..., 0][..., None, None]
    dx = xx[None, None] / out_w - owner_center[..., 1][..., None, None]
    owner_dist = jnp.sqrt(dy**2 + dx**2)  # [B, K, H, W]
    owner_dist_masked = jnp.where(keypoint_valid[..., None, None], owner_dist, _BIG)

    heatmaps = []
    weights = []
    affinities = []
    for channel in range(n_keypoints):
        on_channel = (keypoint_label == channel)[..., None, None]  # [B, K, 1, 1]

        chan_d2 = jnp.where(on_channel, d2, _BIG)
        min_d2 = jnp.min(chan_d2, axis=1)
        heatmaps.append(jnp.exp(-min_d2 / (2.0 * heatmap_sigma**2)))
        weights.append(jnp.exp(-min_d2 / (2.0 * affinity_sigma**2)))

        chan_owner_dist = jnp.where(on_channel, owner_dist_masked, _BIG)
        win = jnp.argmin(chan_owner_dist, axis=1)  # [B, H, W]

        win_cy = jnp.take_along_axis(
            jnp.broadcast_to(owner_center[..., 0][..., None, None], owner_dist.shape),
            win[:, None], axis=1,
        )[:, 0]
        win_cx = jnp.take_along_axis(
            jnp.broadcast_to(owner_center[..., 1][..., None, None], owner_dist.shape),
            win[:, None], axis=1,
        )[:, 0]
        win_dist = jnp.take_along_axis(chan_owner_dist, win[:, None], axis=1)[:, 0]

        disp_y = yy[None] / out_h - win_cy  # [B, H, W]
        disp_x = xx[None] / out_w - win_cx

        any_instance = win_dist < _BIG / 2
        safe_dist = jnp.maximum(win_dist, 1e-12)
        aff_y = jnp.where(any_instance, disp_y / safe_dist, 0.0)
        aff_x = jnp.where(any_instance, disp_x / safe_dist, 0.0)
        affinities.append(jnp.stack((aff_y, aff_x), axis=1))  # [B, 2, H, W]

    heatmap = jnp.stack(heatmaps, axis=1)
    affinity_weight = jnp.stack(weights, axis=1)
    affinity = jnp.stack(affinities, axis=1)
    return heatmap, affinity_weight, affinity


def out_index_for_position(
    position: jnp.ndarray, in_h: int, in_w: int, downsample_ratio: int
) -> jnp.ndarray:
    """Output-grid (y, x) integer cell index of a normalized position
    (reference loss.py:138-142)."""
    out_h = int(in_h // downsample_ratio)
    out_w = int(in_w // downsample_ratio)
    iy = jnp.clip(
        (position[..., 0] * in_h / downsample_ratio).astype(jnp.int32), 0, out_h - 1
    )
    ix = jnp.clip(
        (position[..., 1] * in_w / downsample_ratio).astype(jnp.int32), 0, out_w - 1
    )
    return jnp.stack((iy, ix), axis=-1)


def gather_at_cells(feature: jnp.ndarray, out_index: jnp.ndarray) -> jnp.ndarray:
    """Gather per-object vectors from a dense [B, H, W, C] map.

    Replaces the reference's per-object Python gather loop
    (loss.py:211-229) with one take_along_axis on the flattened grid.

    Args:
      feature:   [B, H, W, C]
      out_index: [B, N, 2] integer (y, x) cell indices.
    Returns:
      [B, N, C]
    """
    b, h, w, c = feature.shape
    flat = feature.reshape(b, h * w, c)
    idx = out_index[..., 0] * w + out_index[..., 1]  # [B, N]
    return jnp.take_along_axis(flat, idx[..., None], axis=1)
