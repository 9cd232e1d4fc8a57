"""Heatmap peak extraction (the CenterNet decode hot path).

Parity targets:
- heatmap_nms     centernet/model/decode.py:629-642 (3x3 max-pool equality)
- heatmap_detect  centernet/model/decode.py:645-669 (flat top-k ->
  (label, y, x) unravel)

This XLA-graph version is the reference implementation; the fused Pallas
kernel in ``ops/pallas/peak_decode.py`` computes the same result and is
benchmarked against it.  Outputs are fixed-size top-k tensors (index,
label, score) — the variable-length Python list construction of the
reference becomes a score mask applied downstream.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def heatmap_nms(heatmap: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Suppress non-peak pixels: keep values equal to their kxk max.

    heatmap: [B, C, H, W] (probabilities). Returns same shape.
    """
    assert kernel_size >= 1 and kernel_size % 2 == 1
    pad = (kernel_size - 1) // 2
    local_max = jax.lax.reduce_window(
        heatmap,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, kernel_size, kernel_size),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )
    return jnp.where(local_max == heatmap, heatmap, 0.0)


def heatmap_detect(
    heatmap: jnp.ndarray, n_detections: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k peaks over all channels of a suppressed heatmap.

    heatmap: [B, C, H, W].
    Returns:
      index: [B, K, 2] int32 (y, x)
      label: [B, K] int32 channel index
      score: [B, K] float
    """
    b, c, h, w = heatmap.shape
    flat = heatmap.reshape(b, c * h * w)
    score, flat_idx = jax.lax.top_k(flat, n_detections)

    label = (flat_idx // (h * w)).astype(jnp.int32)
    cell = (flat_idx % (h * w)).astype(jnp.int32)
    index = jnp.stack((cell // w, cell % w), axis=-1)
    return index, label, score


def peak_decode(
    heatmap_logits: jnp.ndarray, n_detections: int, kernel_size: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused sigmoid -> NMS -> top-k (the full reference decode front end,
    decode.py:446-448)."""
    heatmap = jax.nn.sigmoid(heatmap_logits)
    heatmap = heatmap_nms(heatmap, kernel_size)
    return heatmap_detect(heatmap, n_detections)
