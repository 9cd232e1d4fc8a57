"""Serving decode pipeline tests on hand-constructed prediction maps."""

from math import pi

import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.configs import (
    AngleConfig,
    CenternetModelConfig,
    ObjectConfig,
    ObjectConfigSet,
    YolactModelConfig,
)
from tauv_vision_tpu.models.centernet import Prediction
from tauv_vision_tpu.models.yolact import YolactPrediction
from tauv_vision_tpu.ops.anchors import get_all_anchors
from tauv_vision_tpu.ops.boxes import box_encode
from tauv_vision_tpu.ops.depth import depth_encode
from tauv_vision_tpu.serving.centernet_decode import decode, decode_keypoints
from tauv_vision_tpu.serving.pipeline import (
    back_project,
    depth_window_z,
    mask_mean_z,
)
from tauv_vision_tpu.serving.yolact_decode import decode_yolact

MC = CenternetModelConfig(
    in_h=64, in_w=96, backbone_heights=(1,), backbone_channels=(8, 8),
    downsamples=2, angle_bin_overlap=pi / 3,
)
OUT_H, OUT_W = MC.out_h, MC.out_w  # 16, 24


def _blank_prediction(n_labels=2, with_depth=False, with_yaw=False):
    zeros = lambda c: jnp.zeros((1, OUT_H, OUT_W, c))  # noqa: E731
    return Prediction(
        heatmap=jnp.full((1, OUT_H, OUT_W, n_labels), -10.0),
        keypoint_heatmap=None,
        keypoint_affinity=None,
        size=zeros(2),
        offset=zeros(2),
        roll_bin=None, roll_offset=None,
        pitch_bin=None, pitch_offset=None,
        yaw_bin=zeros(4) if with_yaw else None,
        yaw_offset=zeros(4) if with_yaw else None,
        depth=zeros(1) if with_depth else None,
    )


def test_centernet_decode_positions_and_values():
    pred = _blank_prediction(with_depth=True)
    cy, cx = 5, 11
    pred = pred.replace(
        heatmap=pred.heatmap.at[0, cy, cx, 1].set(4.0),
        size=pred.size.at[0, cy, cx].set(jnp.asarray([0.25, 0.3])),
        offset=pred.offset.at[0, cy, cx].set(jnp.asarray([2.0, 1.0])),
        depth=pred.depth.at[0, cy, cx, 0].set(depth_encode(jnp.asarray(3.0))),
    )
    det = decode(pred, MC, n_detections=3, score_threshold=0.5)
    assert bool(det.valid[0, 0])
    assert int(det.label[0, 0]) == 1
    # y = (ratio * iy + offset_y) / in_h
    np.testing.assert_allclose(float(det.y[0, 0]), (4 * cy + 2.0) / 64, atol=1e-6)
    np.testing.assert_allclose(float(det.x[0, 0]), (4 * cx + 1.0) / 96, atol=1e-6)
    np.testing.assert_allclose(float(det.h[0, 0]), 0.25, atol=1e-6)
    np.testing.assert_allclose(float(det.w[0, 0]), 0.3, atol=1e-6)
    np.testing.assert_allclose(float(det.depth[0, 0]), 3.0, rtol=1e-4)
    # Below-threshold slots are invalid.
    assert not bool(det.valid[0, 1])


def _keypoint_object_config():
    kps = tuple((float(i) * 0.1, 0.0, 0.0) for i in range(7))
    return ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="gate",
                yaw=AngleConfig(train=False, modulo=None),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=False,
                train_keypoints=True,
                keypoints=kps,
            ),
        )
    )


def test_decode_keypoints_matching():
    """One detection; its keypoint peaks get claimed into the right slots."""
    oc = _keypoint_object_config()
    n_kp = oc.n_keypoints
    pred = _blank_prediction(n_labels=1)
    pred = pred.replace(
        keypoint_heatmap=jnp.full((1, OUT_H, OUT_W, n_kp), -10.0),
        keypoint_affinity=jnp.zeros((1, OUT_H, OUT_W, n_kp, 2)),
    )
    dy, dx = 8, 12  # detection center cell
    pred = pred.replace(heatmap=pred.heatmap.at[0, dy, dx, 0].set(6.0))

    # Place keypoint peaks around the detection; affinity = unit vector
    # from detection center to keypoint.
    kp_cells = [(6, 10), (6, 14), (10, 10), (10, 14), (8, 15), (5, 12), (11, 12)]
    for ch, (ky, kx) in enumerate(kp_cells):
        pred = pred.replace(
            keypoint_heatmap=pred.keypoint_heatmap.at[0, ky, kx, ch].set(6.0)
        )
        vec = np.asarray([ky / OUT_H - dy / OUT_H, kx / OUT_W - dx / OUT_W])
        vec = vec / np.linalg.norm(vec)
        pred = pred.replace(
            keypoint_affinity=pred.keypoint_affinity.at[0, ky, kx, ch].set(
                jnp.asarray(vec)
            )
        )

    cam = jnp.asarray([[100.0, 0, 48], [0, 100.0, 32], [0, 0, 1]])
    out = decode_keypoints(
        pred, MC, oc, cam,
        n_detections=2, keypoint_n_detections=10,
        score_threshold=0.5, keypoint_score_threshold=0.5,
    )
    assert bool(out.detections.valid[0, 0])
    claimed = np.asarray(out.keypoint_valid[0, 0])
    assert claimed.sum() == 7
    for ch, (ky, kx) in enumerate(kp_cells):
        assert claimed[ch]
        np.testing.assert_allclose(float(out.keypoint_y[0, 0, ch]), ky / OUT_H)
        np.testing.assert_allclose(float(out.keypoint_x[0, 0, ch]), kx / OUT_W)
    # 7 >= 6 keypoints -> PnP attempted and flagged valid.
    assert bool(out.pose_valid[0, 0])


def test_yolact_decode_end_to_end_synthetic():
    cfg = YolactModelConfig(
        in_w=96, in_h=64, feature_depth=8, n_classes=2, n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0, n_box_layers=0,
        n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5, iou_neg_threshold=0.4,
        negative_example_ratio=3,
    )
    anchors = jnp.asarray(
        get_all_anchors(cfg.in_h, cfg.in_w, 5, cfg.anchor_scales,
                        cfg.anchor_aspect_ratios)
    )
    n = anchors.shape[0]

    target_box = jnp.asarray([[[0.5, 0.5, 0.3, 0.3]]])
    # Find the best anchor and write its encoding + a confident class 2.
    from tauv_vision_tpu.ops.boxes import iou_matrix
    iou = iou_matrix(anchors[None], target_box)[0, :, 0]
    best = int(jnp.argmax(iou))

    cls = jnp.zeros((1, n, 3)).at[:, :, 0].set(5.0)
    cls = cls.at[0, best].set(jnp.asarray([0.0, 0.0, 8.0]))
    enc = jnp.zeros((1, n, 4)).at[0, best].set(
        box_encode(target_box, anchors[None, best: best + 1],
                   cfg.box_variances)[0, 0]
    )
    coeff = jnp.zeros((1, n, 4)).at[0, best, 0].set(1.0)
    proto = jnp.zeros((1, 32, 48, 4)).at[..., 0].set(4.0)  # sigmoid -> ~0.98

    pred = YolactPrediction(
        classification=cls, box_encoding=enc, mask_coeff=coeff,
        anchor=anchors, mask_prototype=proto,
    )
    det = decode_yolact(pred, cfg, top_k=5, iou_threshold=0.5,
                        confidence_threshold=0.5)
    assert bool(det.valid[0, 0])
    assert int(det.label[0, 0]) == 2
    np.testing.assert_allclose(
        np.asarray(det.box[0, 0]), [0.5, 0.5, 0.3, 0.3], atol=1e-5
    )
    # Mask is cropped to the box: high inside, zero outside.
    mask = np.asarray(det.mask[0, 0])
    assert mask[16, 24] > 0.9          # center
    assert mask[2, 2] == 0.0           # outside crop box
    # Only one detection survives.
    assert np.asarray(det.valid[0]).sum() == 1


def test_depth_utils():
    depth = jnp.full((1, 32, 32), 2.0)
    depth = depth.at[0, 10, 10].set(jnp.nan)
    centers = jnp.asarray([[[10, 10], [0, 0]]], dtype=jnp.int32)
    z = depth_window_z(depth, centers, 3)
    np.testing.assert_allclose(np.asarray(z[0]), [2.0, 2.0])

    masks = jnp.zeros((1, 1, 32, 32)).at[0, 0, 5:10, 5:10].set(1.0)
    z2 = mask_mean_z(depth, masks)
    np.testing.assert_allclose(float(z2[0, 0]), 2.0)

    intr = jnp.asarray([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]])
    pt = back_project(
        jnp.asarray(0.5), jnp.asarray(0.5), jnp.asarray(2.0), intr, (32, 32)
    )
    np.testing.assert_allclose(np.asarray(pt), [0.0, 0.0, 2.0], atol=1e-6)
