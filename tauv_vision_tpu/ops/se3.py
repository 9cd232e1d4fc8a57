"""Minimal SO3/SE3 utilities (jax + numpy friendly).

Replaces the reference's ``spatialmath`` / ``cv2.Rodrigues`` usage
(centernet/model/decode.py:560-562, converter, nodes) with a small,
jit-safe rotation toolkit.
"""

from __future__ import annotations

import jax.numpy as jnp


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew matrices."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle [..., 3] -> rotation matrix [..., 3, 3].

    Gradient-safe at w = 0 (the PnP solver linearizes here): the angle is
    computed with an epsilon-regularized norm so d(theta)/dw -> 0 instead
    of NaN, and the sin/cos coefficients switch to their Taylor series for
    small angles.
    """
    theta_sq_raw = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta_sq_raw + 1e-24)  # [..., 1, 1]
    k = hat(w)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)

    theta_sq = theta**2
    small = theta < 1e-4
    safe_theta = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe_theta) / safe_theta)
    b = jnp.where(
        small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_theta)) / safe_theta**2
    )
    return eye + a * k + b * k2


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3]."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)

    v = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = jnp.abs(sin_theta) < 1e-6
    scale = jnp.where(
        small, 0.5 + theta**2 / 12.0, theta / (2.0 * jnp.where(small, 1.0, sin_theta))
    )
    return scale[..., None] * v


def rpy_to_matrix(roll, pitch, yaw) -> jnp.ndarray:
    """ZYX (yaw-pitch-roll) euler to rotation matrix."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
            jnp.stack([-sp, cp * sr, cp * cr], -1),
        ],
        axis=-2,
    )


def matrix_to_rpy(r: jnp.ndarray):
    """Rotation matrix -> (roll, pitch, yaw), ZYX convention."""
    pitch = jnp.arcsin(jnp.clip(-r[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(r[..., 2, 1], r[..., 2, 2])
    yaw = jnp.arctan2(r[..., 1, 0], r[..., 0, 0])
    return roll, pitch, yaw


def se3_transform(rotation: jnp.ndarray, translation: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (R, t) to [..., N, 3] points."""
    return points @ jnp.swapaxes(rotation, -1, -2) + translation[..., None, :]
