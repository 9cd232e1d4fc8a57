"""Image preprocessing + resize ops with PyTorch-matching numerics.

The serving path fuses these into the inference graph so a camera frame
crosses host->HBM exactly once as uint8 (reference preprocessing:
centernet/node/centernet_node.py:90-92, yolact/node/yolact_node.py:106-114
— ToTensor + Resize + Normalize on host, replaced here by on-device ops).

Numerics notes:
- ``resize_bilinear`` matches ``F.interpolate(mode="bilinear",
  align_corners=False)`` (half-pixel centers, no antialias).
- ``resize_nearest`` matches torch's ``mode="nearest"`` legacy convention
  ``src = floor(dst * in/out)``, which differs from jax.image.resize's
  half-pixel nearest.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of [..., H, W] along the last two axes,
    torch align_corners=False semantics."""
    out_shape = img.shape[:-2] + tuple(out_hw)
    return jax.image.resize(img, out_shape, method="bilinear", antialias=False)


def resize_bilinear_nhwc(
    img: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Bilinear resize of [B, H, W, C] along H/W, same semantics as
    :func:`resize_bilinear` (torch align_corners=False) without the
    NCHW round-trip — on TPU the two moveaxis transposes around a
    channels-last resize cost more than the resize itself."""
    b, _, _, c = img.shape
    return jax.image.resize(
        img, (b, out_hw[0], out_hw[1], c), method="bilinear",
        antialias=False,
    )


def resize_nearest(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of [..., H, W], torch legacy 'nearest' semantics."""
    in_h, in_w = img.shape[-2], img.shape[-1]
    out_h, out_w = out_hw
    ys = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
    ys = jnp.clip(ys, 0, in_h - 1)
    xs = jnp.clip(xs, 0, in_w - 1)
    return img[..., ys, :][..., :, xs]


def normalize_image(
    img: jnp.ndarray,
    mean: Sequence[float],
    stddev: Sequence[float],
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """uint8/float [..., H, W, C] image -> normalized float NHWC.

    Matches torchvision ToTensor (scale to [0,1]) + Normalize(mean, std).
    """
    img = img.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, dtype=jnp.float32)
    stddev = jnp.asarray(stddev, dtype=jnp.float32)
    return ((img - mean) / stddev).astype(dtype)


def preprocess(
    img_uint8: jnp.ndarray,
    out_hw: Tuple[int, int],
    mean: Sequence[float],
    stddev: Sequence[float],
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Fused uint8 NHWC camera frame -> resized, normalized NHWC tensor.

    Resize happens in [0,255] float space (matching host-side cv2/PIL
    resize-then-normalize pipelines to bilinear precision).
    """
    img = img_uint8.astype(jnp.float32)
    # NHWC -> resize over H, W.
    img = jnp.moveaxis(img, -1, -3)  # [..., C, H, W]
    img = resize_bilinear(img, out_hw)
    img = jnp.moveaxis(img, -3, -1)  # [..., H, W, C]
    return normalize_image(img, mean, stddev, dtype=dtype)
