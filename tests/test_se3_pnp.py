"""SO3/SE3 utilities and pure-JAX PnP tests."""

import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.ops import pnp, se3


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(10, 3)).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, (10, 1))
    r = se3.so3_exp(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(r))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_exp_is_rotation():
    r = np.asarray(se3.so3_exp(jnp.asarray([0.3, -0.2, 0.9])))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert abs(np.linalg.det(r) - 1) < 1e-6


def test_rpy_roundtrip():
    roll, pitch, yaw = 0.3, -0.4, 1.2
    r = se3.rpy_to_matrix(jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw))
    r2, p2, y2 = se3.matrix_to_rpy(r)
    np.testing.assert_allclose(
        [float(r2), float(p2), float(y2)], [roll, pitch, yaw], atol=1e-5
    )


def _synthetic_pnp_case(seed, n_points=8, noise=0.0):
    rng = np.random.default_rng(seed)
    object_points = rng.uniform(-0.2, 0.2, (n_points, 3)).astype(np.float32)
    w_true = rng.normal(size=3).astype(np.float32) * 0.4
    r_true = np.asarray(se3.so3_exp(jnp.asarray(w_true)))
    t_true = np.asarray([0.1, -0.05, 1.5], np.float32)

    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    camera = np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    pts_cam = object_points @ r_true.T + t_true
    u = fx * pts_cam[:, 0] / pts_cam[:, 2] + cx
    v = fy * pts_cam[:, 1] / pts_cam[:, 2] + cy
    image_points = np.stack([u, v], -1).astype(np.float32)
    image_points += rng.normal(size=image_points.shape).astype(np.float32) * noise
    return object_points, image_points, camera, r_true, t_true


def test_pnp_exact_recovery():
    obj, img, cam, r_true, t_true = _synthetic_pnp_case(1)
    result = pnp.solve_pnp(
        jnp.asarray(obj), jnp.asarray(img), jnp.asarray(cam),
        jnp.ones(len(obj), bool), n_iterations=40,
    )
    assert bool(result.valid)
    assert float(result.error) < 1e-3
    np.testing.assert_allclose(np.asarray(result.translation), t_true, atol=1e-2)
    np.testing.assert_allclose(np.asarray(result.rotation), r_true, atol=1e-2)


def test_pnp_masked_and_insufficient():
    obj, img, cam, r_true, t_true = _synthetic_pnp_case(2, n_points=10)
    mask = np.ones(10, bool)
    mask[7:] = False  # 7 valid >= 6
    result = pnp.solve_pnp(
        jnp.asarray(obj), jnp.asarray(img), jnp.asarray(cam), jnp.asarray(mask),
        n_iterations=40,
    )
    assert bool(result.valid)
    np.testing.assert_allclose(np.asarray(result.translation), t_true, atol=5e-2)

    mask[:] = False
    mask[:5] = True  # 5 < 6 -> invalid
    result = pnp.solve_pnp(
        jnp.asarray(obj), jnp.asarray(img), jnp.asarray(cam), jnp.asarray(mask)
    )
    assert not bool(result.valid)


def test_pnp_batch():
    cases = [_synthetic_pnp_case(s) for s in (3, 4, 5)]
    obj = jnp.asarray(np.stack([c[0] for c in cases]))
    img = jnp.asarray(np.stack([c[1] for c in cases]))
    cam = jnp.asarray(cases[0][2])
    mask = jnp.ones((3, obj.shape[1]), bool)
    result = pnp.solve_pnp_batch(obj, img, cam, mask, n_iterations=40)
    assert result.translation.shape == (3, 3)
    for i, (_, _, _, r_true, t_true) in enumerate(cases):
        np.testing.assert_allclose(
            np.asarray(result.translation[i]), t_true, atol=2e-2
        )
