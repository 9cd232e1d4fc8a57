"""Homography utilities (perspective transforms + image warping).

Replaces the kornia calls in the contrastive interest-point experiment
(experiments/contrastive_interest_points/contrastive_image_points.py:
103-131): 4-point perspective-transform estimation (DLT) and dense
perspective warping with bilinear sampling, in pure jax.
"""

from __future__ import annotations

import jax.numpy as jnp

from tauv_vision_tpu.ops.deform_conv import _bilinear_sample


def get_perspective_transform(
    src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """Solve for H (3x3, H[2,2]=1) with dst ~ H @ src.

    src/dst: [4, 2] (x, y) point quads.  Returns [3, 3].
    """
    rows = []
    rhs = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack(
            [x, y, jnp.ones(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
             -u * x, -u * y]
        ))
        rhs.append(u)
        rows.append(jnp.stack(
            [jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), x, y, jnp.ones(()),
             -v * x, -v * y]
        ))
        rhs.append(v)
    a = jnp.stack(rows)               # [8, 8]
    b = jnp.stack(rhs)                # [8]
    h8 = jnp.linalg.solve(a, b)
    return jnp.concatenate([h8, jnp.ones((1,))]).reshape(3, 3)


def warp_perspective(
    img: jnp.ndarray, matrix: jnp.ndarray, out_hw=None
) -> jnp.ndarray:
    """Warp [B, H, W, C] images by H (dst <- H @ src convention, like
    kornia: output pixel p gets img at H^-1 p)."""
    b, h, w, c = img.shape
    oh, ow = out_hw if out_hw is not None else (h, w)

    inv = jnp.linalg.inv(matrix)

    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=0).reshape(3, -1)  # [3, oh*ow]

    src = inv @ pts
    sx = (src[0] / src[2]).reshape(oh, ow)
    sy = (src[1] / src[2]).reshape(oh, ow)

    sx = jnp.broadcast_to(sx[None], (b, oh, ow))
    sy = jnp.broadcast_to(sy[None], (b, oh, ow))
    return _bilinear_sample(img, sy, sx)
