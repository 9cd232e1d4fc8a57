"""Multi-scale box encode/decode correctness (the reference README TODO
"Check that box encoding / decoding is set up correctly for multi scale"
and BASELINE config #3's multi-scale path, made into real assertions)."""

import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.ops.anchors import fpn_level_sizes, get_all_anchors, get_anchor
from tauv_vision_tpu.ops.boxes import box_decode, box_encode, iou_matrix

IN_H, IN_W = 360, 640
SCALES = (24, 48, 96, 192, 384)
ARS = (1.0,)
VARIANCES = (0.1, 0.2)


def _level_slices():
    sizes = fpn_level_sizes(IN_H, IN_W, 5)
    slices = []
    start = 0
    for fh, fw in sizes:
        n = fh * fw * len(ARS)
        slices.append(slice(start, start + n))
        start += n
    return sizes, slices


def test_encode_decode_roundtrip_per_level():
    """A box centered on any level's anchor round-trips through the SSD
    codec at every scale."""
    anchors = jnp.asarray(get_all_anchors(IN_H, IN_W, 5, SCALES, ARS))
    sizes, slices = _level_slices()

    rng = np.random.default_rng(0)
    for level, sl in enumerate(slices):
        level_anchors = anchors[sl]
        pick = rng.integers(0, level_anchors.shape[0], 16)
        anchor = level_anchors[pick][None]  # [1, 16, 4]
        # Perturbed truth boxes at this level's scale.
        box = anchor + jnp.asarray(
            rng.normal(size=(1, 16, 4)).astype(np.float32)
        ) * jnp.asarray([0.01, 0.01, 0.0, 0.0]) + jnp.asarray(
            [0.0, 0.0, 0.0, 0.0]
        )
        box = box * jnp.asarray([1.0, 1.0, 1.2, 0.9])  # scale h/w
        enc = box_encode(box, anchor, VARIANCES)
        dec = box_decode(enc, anchor, VARIANCES)
        np.testing.assert_allclose(
            np.asarray(dec), np.asarray(box), atol=1e-5,
            err_msg=f"level {level}",
        )


def test_objects_match_anchors_at_their_own_scale():
    """A truth box sized like level L's anchors achieves its best IoU
    with a level-L anchor — the multi-scale assignment works."""
    anchors = jnp.asarray(get_all_anchors(IN_H, IN_W, 5, SCALES, ARS))
    sizes, slices = _level_slices()
    in_size = (IN_H + IN_W) / 2

    for level, scale in enumerate(SCALES):
        side = scale / in_size
        box = jnp.asarray([[[0.5, 0.5, side, side]]])
        iou = np.asarray(iou_matrix(anchors[None], box))[0, :, 0]
        best = int(iou.argmax())
        assert slices[level].start <= best < slices[level].stop, (
            f"scale {scale} matched outside level {level}"
        )
        assert iou[best] > 0.5


def test_anchor_grid_alignment_per_level():
    """Within each level, consecutive anchors advance along x then y
    (cell-major) so prediction-map reshapes line up."""
    sizes = fpn_level_sizes(IN_H, IN_W, 5)
    for level, (fh, fw) in enumerate(sizes):
        anchors = get_anchor(level, (fh, fw), SCALES, ARS, IN_H, IN_W)
        grid = anchors.reshape(fh, fw, len(ARS), 4)
        # x varies along axis 1, y along axis 0.
        np.testing.assert_allclose(
            grid[0, :, 0, 1], (np.arange(fw) + 0.5) / fw, atol=1e-6
        )
        np.testing.assert_allclose(
            grid[:, 0, 0, 0], (np.arange(fh) + 0.5) / fh, atol=1e-6
        )
