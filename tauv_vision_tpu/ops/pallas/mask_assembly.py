"""Fused YOLACT mask assembly as a Pallas TPU kernel.

sigmoid(coeff @ prototypes) * box_crop in one kernel (reference
masks.py:8-21 + boxes.py:88-103): the prototype tile is read once into
VMEM, the coefficient matmul rides the MXU, and the sigmoid + crop
rasterization fuse into the epilogue — the assembled masks are written
to HBM exactly once.

Grid: one program per batch element.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mask_assembly_kernel(proto_ref, coeff_ref, box_ref, out_ref, *, crop: bool):
    # proto/out are blocked per batch element (leading singleton); the
    # small coeff/box tensors stay whole and are indexed by program id.
    # The prototype count P is small (8-32), so the coefficient
    # contraction runs as P broadcast multiply-adds on the VPU — Mosaic
    # cannot reshape [P, H, W] into a [P, H*W] matmul operand (lane-
    # merging reshape), and at K~20 the MXU would be underfed anyway.
    _, p, h, w = proto_ref.shape
    k = coeff_ref.shape[1]
    i = pl.program_id(0)

    logits = jnp.zeros((k, h, w), jnp.float32)
    for proto_i in range(p):
        coeff = coeff_ref[i, :, proto_i]  # [K]
        logits = logits + coeff[:, None, None] * proto_ref[0, proto_i][None]
    mask = jax.nn.sigmoid(logits)

    if crop:
        # Mosaic iota must be integer; cast after.
        ys = jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 1).astype(
            jnp.float32
        )
        xs = jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 2).astype(
            jnp.float32
        )
        cy = box_ref[i, :, 0][:, None, None] * h
        cx = box_ref[i, :, 1][:, None, None] * w
        bh = box_ref[i, :, 2][:, None, None] * h
        bw = box_ref[i, :, 3][:, None, None] * w
        inside = (
            (xs >= cx - bw / 2) & (xs <= cx + bw / 2)
            & (ys >= cy - bh / 2) & (ys <= cy + bh / 2)
        )
        mask = mask * inside.astype(jnp.float32)

    out_ref[0] = mask


@functools.partial(jax.jit, static_argnums=(3,))
def assemble_mask_pallas(
    mask_prototype: jnp.ndarray,
    mask_coeff: jnp.ndarray,
    box: Optional[jnp.ndarray] = None,
    crop: bool = True,
) -> jnp.ndarray:
    """Drop-in replacement for ops.masks.assemble_mask_batch.

    Args:
      mask_prototype: [B, P, H, W]
      mask_coeff: [B, K, P]
      box: [B, K, 4] (required when crop=True)
    Returns: [B, K, H, W]
    """
    b, p, h, w = mask_prototype.shape
    k = mask_coeff.shape[1]
    if box is None:
        crop = False
        box = jnp.zeros((b, k, 4), jnp.float32)

    kernel = functools.partial(_mask_assembly_kernel, crop=crop)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k, p), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k, 4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, h, w), jnp.float32),
    )(
        mask_prototype.astype(jnp.float32),
        mask_coeff.astype(jnp.float32),
        box.astype(jnp.float32),
    )
