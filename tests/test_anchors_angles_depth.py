"""Anchor generation, angle codec, depth codec unit tests."""

from math import pi, sqrt

import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.ops import anchors, angles, depth


def test_fpn_level_sizes_640x360():
    sizes = anchors.fpn_level_sizes(360, 640, 5)
    assert sizes == ((45, 80), (23, 40), (12, 20), (6, 10), (3, 5))


def test_anchor_values_single_ar():
    a = anchors.get_anchor(0, (4, 6), [24], [1.0], in_h=360, in_w=640)
    assert a.shape == (4 * 6, 4)
    np.testing.assert_allclose(a[0, :2], [0.5 / 4, 0.5 / 6], atol=1e-6)
    expected = 24 / ((360 + 640) / 2)
    np.testing.assert_allclose(a[:, 2], expected, atol=1e-6)
    np.testing.assert_allclose(a[:, 3], expected, atol=1e-6)


def test_anchor_aspect_ratios_cell_major():
    ars = [0.5, 1.0, 2.0]
    a = anchors.get_anchor(1, (2, 2), [24, 48], ars, in_h=360, in_w=640)
    assert a.shape == (2 * 2 * 3, 4)
    base = 48 / 500.0
    # First three rows = all aspect ratios of cell (0, 0).
    np.testing.assert_allclose(a[:3, 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(a[:3, 1], 0.25, atol=1e-6)
    np.testing.assert_allclose(
        a[:3, 2], [base * sqrt(ar) for ar in ars], atol=1e-6
    )
    np.testing.assert_allclose(
        a[:3, 3], [base / sqrt(ar) for ar in ars], atol=1e-6
    )


def test_all_anchors_count():
    a = anchors.get_all_anchors(360, 640, 5, (24, 48, 96, 192, 384), (1.0,))
    n = 45 * 80 + 23 * 40 + 12 * 20 + 6 * 10 + 3 * 5
    assert a.shape == (n, 4)


def test_angle_roundtrip():
    rng = np.random.default_rng(0)
    theta_range = 2 * pi
    truth = rng.uniform(0, theta_range, (4, 7)).astype(np.float32)

    inside, offsets = angles.angle_encode(
        jnp.asarray(truth), jnp.asarray(np.full_like(truth, theta_range)), pi / 3
    )
    # Build ideal predictions from the targets: logits +/- 10 for bins,
    # exact offsets.
    bin_logits = np.zeros((4, 7, 4), np.float32)
    inside_np = np.asarray(inside)
    bin_logits[..., 1] = np.where(inside_np[..., 0] == 1, 10.0, -10.0)
    bin_logits[..., 3] = np.where(inside_np[..., 1] == 1, 10.0, -10.0)
    off = np.asarray(offsets).reshape(4, 7, 4)

    decoded = np.asarray(
        angles.angle_decode(
            jnp.asarray(bin_logits), jnp.asarray(off), theta_range, pi / 3
        )
    )
    err = np.abs((decoded - truth + pi) % (2 * pi) - pi)
    assert err.max() < 1e-4


def test_angle_roundtrip_modulo():
    """Angles under a pi/2 modulo (square symmetry) decode mod pi/2."""
    theta_range = pi / 2
    truth = np.linspace(0.01, theta_range - 0.01, 9, dtype=np.float32)[None]

    inside, offsets = angles.angle_encode(
        jnp.asarray(truth), jnp.asarray(np.full_like(truth, theta_range)), pi / 3
    )
    bin_logits = np.zeros((1, 9, 4), np.float32)
    inside_np = np.asarray(inside)
    bin_logits[..., 1] = np.where(inside_np[..., 0] == 1, 10.0, -10.0)
    bin_logits[..., 3] = np.where(inside_np[..., 1] == 1, 10.0, -10.0)
    off = np.asarray(offsets).reshape(1, 9, 4)

    decoded = np.asarray(
        angles.angle_decode(
            jnp.asarray(bin_logits), jnp.asarray(off), theta_range, pi / 3
        )
    )
    err = np.abs((decoded - truth + theta_range / 2) % theta_range - theta_range / 2)
    assert err.max() < 1e-4


def test_angle_loss_zero_at_perfect_prediction():
    theta_range = 2 * pi
    truth = jnp.asarray([[0.3, 2.0, 5.0]])
    ranges = jnp.full_like(truth, theta_range)
    inside, offsets = angles.angle_encode(truth, ranges, pi / 3)
    big = 100.0
    bin_logits = jnp.stack(
        [
            -big * inside[..., 0].astype(jnp.float32) + big / 2,
            big * inside[..., 0].astype(jnp.float32) - big / 2,
            -big * inside[..., 1].astype(jnp.float32) + big / 2,
            big * inside[..., 1].astype(jnp.float32) - big / 2,
        ],
        axis=-1,
    )
    off = offsets.reshape(1, 3, 4)
    loss = np.asarray(angles.angle_loss(bin_logits, off, truth, ranges, pi / 3))
    assert loss.max() < 1e-3


def test_angle_in_range_wraps():
    a = jnp.asarray([0.1, 3.0, 6.0])
    out = np.asarray(angles.angle_in_range(a, -0.5, 0.5))
    np.testing.assert_array_equal(out, [True, False, True])


def test_depth_roundtrip():
    d = jnp.asarray([0.1, 1.0, 5.0, 30.0])
    enc = depth.depth_encode(d)
    dec = depth.depth_decode(enc)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(d), rtol=1e-4)


def test_depth_loss_zero_at_truth():
    d = jnp.asarray([0.5, 2.0])
    loss = np.asarray(depth.depth_loss(depth.depth_encode(d), d))
    assert loss.max() < 1e-5
