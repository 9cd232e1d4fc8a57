"""Perspective-n-Point pose recovery in pure JAX.

Replaces ``cv2.solvePnP(..., SOLVEPNP_ITERATIVE)`` + ``cv2.Rodrigues``
(centernet/model/decode.py:557-562) with a Levenberg-Marquardt refinement
on SE(3), fully jit/vmap-safe so pose recovery stays on-device instead of
breaking the inference graph with a host callback.

Masked points are supported (weight 0) so the ragged >=6-keypoint gating
of the reference becomes a static-shape computation: callers run PnP for
every detection slot and use ``n_points >= 6`` to validate the result,
matching the reference's gate (decode.py:531).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tauv_vision_tpu.ops.se3 import so3_exp


class PnPResult(NamedTuple):
    rotation: jnp.ndarray     # [..., 3, 3]
    translation: jnp.ndarray  # [..., 3]
    error: jnp.ndarray        # [...] mean squared reprojection error (px^2)
    valid: jnp.ndarray        # [...] bool (enough points & finite result)


def _project(
    points_cam: jnp.ndarray, fx, fy, cx, cy
) -> jnp.ndarray:
    z = jnp.maximum(points_cam[..., 2], 1e-6)
    u = fx * points_cam[..., 0] / z + cx
    v = fy * points_cam[..., 1] / z + cy
    return jnp.stack((u, v), axis=-1)


def _solve_spd_6(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the 6x6 SPD system a @ x = b via an unrolled Cholesky.

    Plain jnp ops only: ``jnp.linalg.solve`` lowers to a linear-algebra
    custom call whose kernel intermittently crashes the TPU worker when
    this solver runs vmapped inside the fused YOLO-Pose serving graph.
    A statically unrolled 6x6 Cholesky is also faster at this size."""
    n = 6
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                l[i][j] = s / l[j][j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x, axis=-1)


def solve_pnp(
    object_points: jnp.ndarray,
    image_points: jnp.ndarray,
    camera_matrix: jnp.ndarray,
    mask: jnp.ndarray,
    n_iterations: int = 20,
    min_points: int = 6,
) -> PnPResult:
    """LM-refined PnP for one point set.

    Args:
      object_points: [N, 3] 3D points in the object frame.
      image_points: [N, 2] (u, v) pixel observations.
      camera_matrix: [3, 3] intrinsics.
      mask: [N] bool validity of each correspondence.
    """
    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    cx, cy = camera_matrix[0, 2], camera_matrix[1, 2]
    w = mask.astype(jnp.float32)
    n_points = w.sum()

    # Initialization: object centered in front of the camera at a depth
    # scaled from the image-point spread (a weak-perspective guess).
    obj_center = (object_points * w[:, None]).sum(0) / jnp.maximum(n_points, 1.0)
    img_center = (image_points * w[:, None]).sum(0) / jnp.maximum(n_points, 1.0)
    obj_spread = jnp.sqrt(
        ((object_points - obj_center) ** 2).sum(-1) * w
    ).sum() / jnp.maximum(n_points, 1.0)
    img_spread = jnp.sqrt(
        ((image_points - img_center) ** 2).sum(-1) * w
    ).sum() / jnp.maximum(n_points, 1.0)
    z0 = fx * obj_spread / jnp.maximum(img_spread, 1e-3)
    z0 = jnp.clip(z0, 0.05, 100.0)
    t0 = jnp.stack(
        [
            (img_center[0] - cx) / fx * z0,
            (img_center[1] - cy) / fy * z0,
            z0,
        ]
    ) - obj_center

    def residual(params):
        w_rot, t = params[:3], params[3:]
        r = so3_exp(w_rot)
        pts_cam = object_points @ r.T + t
        proj = _project(pts_cam, fx, fy, cx, cy)
        return ((proj - image_points) * w[:, None]).reshape(-1)

    def lm_step(carry, _):
        params, damping = carry
        res = residual(params)
        jac = jax.jacobian(residual)(params)  # [2N, 6]
        jtj = jac.T @ jac
        jtr = jac.T @ res
        step = _solve_spd_6(
            jtj + damping * jnp.eye(6) * (1.0 + jnp.diag(jtj)), -jtr
        )
        new_params = params + step
        new_cost = (residual(new_params) ** 2).sum()
        old_cost = (res**2).sum()
        improved = new_cost < old_cost
        params = jnp.where(improved, new_params, params)
        damping = jnp.where(improved, damping * 0.5, damping * 4.0)
        damping = jnp.clip(damping, 1e-8, 1e6)
        return (params, damping), None

    params0 = jnp.concatenate([jnp.zeros(3), t0])
    (params, _), _ = jax.lax.scan(
        lm_step, (params0, jnp.asarray(1e-3)), None, length=n_iterations
    )

    rotation = so3_exp(params[:3])
    translation = params[3:]
    final_res = residual(params)
    error = (final_res**2).sum() / jnp.maximum(n_points, 1.0)

    valid = (n_points >= min_points) & jnp.isfinite(error)
    return PnPResult(
        rotation=rotation, translation=translation, error=error, valid=valid
    )


def solve_pnp_batch(
    object_points: jnp.ndarray,
    image_points: jnp.ndarray,
    camera_matrix: jnp.ndarray,
    mask: jnp.ndarray,
    n_iterations: int = 20,
    min_points: int = 6,
) -> PnPResult:
    """vmapped :func:`solve_pnp` over a leading detections axis."""
    return jax.vmap(
        lambda o, i, m: solve_pnp(
            o, i, camera_matrix, m, n_iterations, min_points
        )
    )(object_points, image_points, mask)
