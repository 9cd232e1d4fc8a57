"""YOLACT mask assembly: sigmoid(prototypes @ coefficients), optional crop.

Parity target: ``yolact/model/masks.py:8-21``.

The reference assembles one detection at a time with a broadcast-multiply
reduction; here the whole detection set is a single [K, P] x [P, H*W]
matmul that maps straight onto the MXU.  ``ops/pallas/mask_assembly.py``
provides a fused kernel variant (matmul + sigmoid + box crop in VMEM).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tauv_vision_tpu.ops.boxes import box_to_mask


def assemble_mask(
    mask_prototype: jnp.ndarray,
    mask_coeff: jnp.ndarray,
    box: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Assemble instance masks from prototypes and per-detection coefficients.

    Args:
      mask_prototype: [P, H, W] prototype stack (single sample).
      mask_coeff: [K, P] per-detection coefficients.
      box: optional [K, 4] normalized (y, x, h, w) crop boxes.
    Returns:
      [K, H, W] masks in [0, 1].
    """
    p, h, w = mask_prototype.shape
    logits = jnp.dot(
        mask_coeff,
        mask_prototype.reshape(p, h * w),
        preferred_element_type=jnp.float32,
    )  # [K, H*W]
    mask = jax.nn.sigmoid(logits).reshape(-1, h, w)

    if box is not None:
        mask = mask * box_to_mask(box, (h, w))

    return mask


def assemble_mask_batch(
    mask_prototype: jnp.ndarray,
    mask_coeff: jnp.ndarray,
    box: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched :func:`assemble_mask`.

    Args:
      mask_prototype: [B, P, H, W]
      mask_coeff: [B, K, P]
      box: optional [B, K, 4]
    Returns:
      [B, K, H, W]
    """
    if box is None:
        return jax.vmap(lambda proto, coeff: assemble_mask(proto, coeff))(
            mask_prototype, mask_coeff
        )
    return jax.vmap(assemble_mask)(mask_prototype, mask_coeff, box)
