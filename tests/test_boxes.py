"""Box math unit tests, including numeric parity against a torch (CPU)
re-statement of the reference formulas (yolact/model/boxes.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tauv_vision_tpu.ops import boxes

VARIANCES = (0.1, 0.2)


def rand_boxes(shape, seed=0):
    rng = np.random.default_rng(seed)
    # Center in [0.2, 0.8], size in [0.05, 0.4] so boxes stay sane.
    yx = rng.uniform(0.2, 0.8, shape[:-1] + (2,))
    hw = rng.uniform(0.05, 0.4, shape[:-1] + (2,))
    return np.concatenate([yx, hw], axis=-1).astype(np.float32)


def test_corners_roundtrip():
    box = rand_boxes((2, 7, 4))
    out = boxes.corners_to_box(boxes.box_to_corners(jnp.asarray(box)))
    np.testing.assert_allclose(np.asarray(out), box, atol=1e-6)


def test_encode_decode_roundtrip():
    box = rand_boxes((2, 7, 4), seed=1)
    anchor = rand_boxes((2, 7, 4), seed=2)
    enc = boxes.box_encode(jnp.asarray(box), jnp.asarray(anchor), VARIANCES)
    dec = boxes.box_decode(enc, jnp.asarray(anchor), VARIANCES)
    np.testing.assert_allclose(np.asarray(dec), box, atol=1e-4)


def test_xy_swap_involution():
    box = rand_boxes((1, 5, 4), seed=3)
    out = boxes.box_xy_swap(boxes.box_xy_swap(jnp.asarray(box)))
    np.testing.assert_allclose(np.asarray(out), box)


def _torch_iou(box_a, box_b):
    """Reference IoU formula restated in torch (boxes.py:64-85)."""
    def to_corners(b):
        return torch.stack(
            (
                b[..., 0] - b[..., 2] / 2,
                b[..., 1] - b[..., 3] / 2,
                b[..., 0] + b[..., 2] / 2,
                b[..., 1] + b[..., 3] / 2,
            ),
            dim=-1,
        )

    ca, cb = to_corners(box_a), to_corners(box_b)
    ymin = torch.max(ca[..., :, None, 0], cb[..., None, :, 0])
    xmin = torch.max(ca[..., :, None, 1], cb[..., None, :, 1])
    ymax = torch.min(ca[..., :, None, 2], cb[..., None, :, 2])
    xmax = torch.min(ca[..., :, None, 3], cb[..., None, :, 3])
    inter = (ymax - ymin).clamp(min=0) * (xmax - xmin).clamp(min=0)
    area_a = box_a[..., 2] * box_a[..., 3]
    area_b = box_b[..., 2] * box_b[..., 3]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / union


def test_iou_matrix_parity_with_torch():
    a = rand_boxes((3, 11, 4), seed=4)
    b = rand_boxes((3, 6, 4), seed=5)
    ours = np.asarray(boxes.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    theirs = _torch_iou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    assert ours.shape == (3, 11, 6)


def test_iou_identity():
    a = rand_boxes((1, 4, 4), seed=6)
    iou = np.asarray(boxes.iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diagonal(iou, axis1=1, axis2=2), 1.0, atol=1e-5)


def test_box_to_mask_matches_reference_semantics():
    """Pixel in iff left <= x <= right and top <= y <= bottom in px units."""
    box = jnp.asarray([0.5, 0.5, 0.25, 0.5])  # on a 16x16 grid
    mask = np.asarray(boxes.box_to_mask(box, (16, 16)))
    ys, xs = np.nonzero(mask)
    # top=6, bottom=10, left=4, right=12 in pixel units
    assert ys.min() == 6 and ys.max() == 10
    assert xs.min() == 4 and xs.max() == 12


def test_box_to_mask_vectorized():
    b = jnp.asarray(rand_boxes((2, 3, 4), seed=7))
    masks = boxes.box_to_mask(b, (32, 48))
    assert masks.shape == (2, 3, 32, 48)
    # Each mask must match its single-box rasterization.
    single = boxes.box_to_mask(b[1, 2], (32, 48))
    np.testing.assert_array_equal(np.asarray(masks[1, 2]), np.asarray(single))


def test_box_clip():
    b = jnp.asarray([[-0.1, 0.5, 0.4, 2.0]])
    clipped = np.asarray(boxes.box_clip(b))
    corners = np.asarray(boxes.box_to_corners(jnp.asarray(clipped)))
    assert (corners >= -1e-6).all() and (corners <= 1 + 1e-6).all()
