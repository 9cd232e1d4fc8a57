"""Numeric parity against the reference's OWN code.

These tests import the actual TAUV-Vision modules from /root/reference
(torch CPU) and compare our jax implementations on identical inputs —
the BASELINE requirement that decoded outputs and losses match the
reference within 1e-3.

Missing third-party deps of the reference (torchvision, spatialmath) are
stubbed with inert modules: the functions under test never call them,
they are only imported at module scope.
"""

import sys
import types
from math import pi

import jax.numpy as jnp
import numpy as np
import pytest
import torch

REFERENCE = "/root/reference/src"


@pytest.fixture(scope="module", autouse=True)
def reference_path():
    sys.path.insert(0, REFERENCE)
    # Stub torchvision (pose_dataset imports transforms.v2 at module scope)
    # and spatialmath (decode imports SE3/SO3 for the keypoint path only).
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")
        v2 = types.ModuleType("torchvision.transforms.v2")
        for name in ("ToImageTensor", "ConvertImageDtype", "Compose",
                     "ToTensor", "Resize", "Normalize"):
            setattr(v2, name, lambda *a, **k: None)
        transforms.v2 = v2
        tv.transforms = transforms
        ops = types.ModuleType("torchvision.ops")
        ops.DeformConv2d = object
        tv.ops = ops
        models = types.ModuleType("torchvision.models")
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.v2"] = v2
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.models"] = models
    if "spatialmath" not in sys.modules:
        sm = types.ModuleType("spatialmath")
        sm.SE3 = object
        sm.SO3 = object
        sys.modules["spatialmath"] = sm
    if "cv2" not in sys.modules:
        import cv2  # noqa: F401
    yield
    sys.path.remove(REFERENCE)


def _ref_yolact_config(n=None):
    from tauv_vision.yolact.model.config import ModelConfig

    return ModelConfig(
        in_w=96, in_h=64, feature_depth=8, n_classes=2, n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.4,
        iou_neg_threshold=0.3, negative_example_ratio=3,
        img_mean=(0.485, 0.456, 0.406), img_stddev=(0.229, 0.224, 0.225),
    )


def _my_yolact_config():
    from tauv_vision_tpu.configs import YolactModelConfig

    return YolactModelConfig(
        in_w=96, in_h=64, feature_depth=8, n_classes=2, n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.4,
        iou_neg_threshold=0.3, negative_example_ratio=3,
    )


def test_box_codec_parity_with_reference():
    from tauv_vision.yolact.model import boxes as ref_boxes

    from tauv_vision_tpu.ops import boxes as my_boxes

    cfg = _ref_yolact_config()
    rng = np.random.default_rng(0)
    box = np.concatenate(
        [rng.uniform(0.2, 0.8, (2, 9, 2)), rng.uniform(0.05, 0.4, (2, 9, 2))],
        -1,
    ).astype(np.float32)
    anchor = np.concatenate(
        [rng.uniform(0.2, 0.8, (2, 9, 2)), rng.uniform(0.05, 0.4, (2, 9, 2))],
        -1,
    ).astype(np.float32)

    ref_enc = ref_boxes.box_encode(
        torch.from_numpy(box), torch.from_numpy(anchor), cfg
    ).numpy()
    my_enc = np.asarray(
        my_boxes.box_encode(jnp.asarray(box), jnp.asarray(anchor), (0.1, 0.2))
    )
    np.testing.assert_allclose(my_enc, ref_enc, atol=1e-3)

    ref_dec = ref_boxes.box_decode(
        torch.from_numpy(my_enc), torch.from_numpy(anchor), cfg
    ).numpy()
    my_dec = np.asarray(
        my_boxes.box_decode(jnp.asarray(my_enc), jnp.asarray(anchor), (0.1, 0.2))
    )
    np.testing.assert_allclose(my_dec, ref_dec, atol=1e-3)

    ref_iou = ref_boxes.iou_matrix(
        torch.from_numpy(box), torch.from_numpy(anchor)
    ).numpy()
    my_iou = np.asarray(
        my_boxes.iou_matrix(jnp.asarray(box), jnp.asarray(anchor))
    )
    np.testing.assert_allclose(my_iou, ref_iou, atol=1e-4)


def test_anchor_parity_with_reference_single_ar():
    """Cell-major vs aspect-major only differ for multiple aspect ratios;
    the production single-AR config must match the reference exactly."""
    from tauv_vision.yolact.model import anchors as ref_anchors

    from tauv_vision_tpu.ops import anchors as my_anchors

    cfg = _ref_yolact_config()
    fpn_size = (8, 12)
    ref = ref_anchors.get_anchor(1, fpn_size, cfg)[0].numpy()
    mine = my_anchors.get_anchor(1, fpn_size, cfg.anchor_scales,
                                 cfg.anchor_aspect_ratios, 64, 96)
    np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_yolact_loss_parity_with_reference():
    """The full YOLACT loss (OHEM classification + box + mask) on
    identical inputs, reference torch vs our vectorized jax."""
    from tauv_vision.yolact.model.loss import loss as ref_loss

    from tauv_vision_tpu.configs import YolactTrainConfig
    from tauv_vision_tpu.models.yolact import YolactPrediction
    from tauv_vision_tpu.ops.anchors import get_all_anchors
    from tauv_vision_tpu.train.yolact_task import YolactTruth, yolact_loss

    ref_cfg = _ref_yolact_config()
    my_cfg = _my_yolact_config()

    rng = np.random.default_rng(1)
    anchors = get_all_anchors(64, 96, 5, my_cfg.anchor_scales,
                              my_cfg.anchor_aspect_ratios)
    n = anchors.shape[0]
    b, m, p = 2, 3, 4
    proto_h, proto_w = 32, 48

    classification = rng.normal(size=(b, n, 3)).astype(np.float32)
    box_encoding = (rng.normal(size=(b, n, 4)) * 0.3).astype(np.float32)
    mask_coeff = np.tanh(rng.normal(size=(b, n, p))).astype(np.float32)
    prototype = rng.normal(size=(b, p, proto_h, proto_w)).astype(np.float32)

    valid = np.asarray([[True, True, False], [True, False, False]])
    truth_cls = np.asarray([[1, 2, 0], [2, 0, 0]], np.int64)
    truth_box = np.concatenate(
        [rng.uniform(0.3, 0.7, (b, m, 2)), rng.uniform(0.2, 0.5, (b, m, 2))],
        -1,
    ).astype(np.float32)
    # Instance seg: paint object index rectangles, 255 elsewhere, a 254
    # invalid strip to exercise img_valid.
    seg = np.full((b, 64, 96), 255, np.uint8)
    for bi in range(b):
        for mi in range(m):
            if not valid[bi, mi]:
                continue
            cy, cx, hh, ww = truth_box[bi, mi]
            y0, y1 = int((cy - hh / 2) * 64), int((cy + hh / 2) * 64)
            x0, x1 = int((cx - ww / 2) * 96), int((cx + ww / 2) * 96)
            seg[bi, y0:y1, x0:x1] = mi
    seg[:, :4, :] = 254
    img_valid = seg != 254

    # ---- reference (torch) ----
    ref_prediction = (
        torch.from_numpy(classification),
        torch.from_numpy(box_encoding),
        torch.from_numpy(mask_coeff),
        torch.from_numpy(anchors[None]),
        torch.from_numpy(prototype),
    )
    ref_truth = (
        torch.from_numpy(valid),
        torch.from_numpy(truth_cls.astype(np.uint8)),
        torch.from_numpy(truth_box),
        torch.from_numpy(seg.astype(np.int64)),
        torch.from_numpy(img_valid),
    )
    _, (ref_cls, ref_box, ref_mask) = ref_loss(
        ref_prediction, ref_truth, ref_cfg
    )

    # ---- ours (jax) ----
    my_prediction = YolactPrediction(
        classification=jnp.asarray(classification),
        box_encoding=jnp.asarray(box_encoding),
        mask_coeff=jnp.asarray(mask_coeff),
        anchor=jnp.asarray(anchors),
        mask_prototype=jnp.asarray(np.moveaxis(prototype, 1, -1)),
    )
    my_truth = YolactTruth(
        valid=jnp.asarray(valid),
        classification=jnp.asarray(truth_cls.astype(np.int32)),
        box=jnp.asarray(truth_box),
        seg_map=jnp.asarray(seg.astype(np.int32)),
        img_valid=jnp.asarray(img_valid),
    )
    tc = YolactTrainConfig(
        lr=1e-3, momentum=0.9, weight_decay=0, grad_max_norm=1,
        n_epochs=1, batch_size=b, epoch_n_batches=1,
        max_objects=m, max_positive_anchors=64,  # cap >= n_pos: exact
    )
    mine = yolact_loss(my_prediction, my_truth, my_cfg, tc)

    np.testing.assert_allclose(
        float(mine.classification), float(ref_cls), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        float(mine.box), float(ref_box), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        float(mine.mask), float(ref_mask), atol=2e-3, rtol=2e-3
    )


def test_yolact_loss_parity_crowded_scene_exact():
    """>64 positive anchors (the round-1 cap) — the exact mask-loss mode
    (max_positive_anchors=None) must match the reference's loop over ALL
    positives, and the capped mode must report the clipped count."""
    from tauv_vision.yolact.model.loss import loss as ref_loss

    from tauv_vision_tpu.configs import YolactTrainConfig
    from tauv_vision_tpu.models.yolact import YolactPrediction
    from tauv_vision_tpu.ops.anchors import get_all_anchors
    from tauv_vision_tpu.ops.boxes import iou_matrix
    from tauv_vision_tpu.train.yolact_task import YolactTruth, yolact_loss

    import dataclasses

    # Loosen the match threshold and enlarge the anchor field (512 anchors
    # at 128x192) so the 8-box scene yields >64 positives while leaving
    # enough negatives for the reference's 3:1 OHEM top-k.
    in_h, in_w = 128, 192
    ref_cfg = dataclasses.replace(
        _ref_yolact_config(), in_h=in_h, in_w=in_w,
        iou_pos_threshold=0.3, iou_neg_threshold=0.25,
    )
    my_cfg = dataclasses.replace(
        _my_yolact_config(), in_h=in_h, in_w=in_w,
        iou_pos_threshold=0.3, iou_neg_threshold=0.25,
    )

    rng = np.random.default_rng(7)
    anchors = get_all_anchors(in_h, in_w, 5, my_cfg.anchor_scales,
                              my_cfg.anchor_aspect_ratios)
    n = anchors.shape[0]
    b, m, p = 1, 8, 4
    proto_h, proto_w = 32, 48

    classification = rng.normal(size=(b, n, 3)).astype(np.float32)
    box_encoding = (rng.normal(size=(b, n, 4)) * 0.3).astype(np.float32)
    mask_coeff = np.tanh(rng.normal(size=(b, n, p))).astype(np.float32)
    prototype = rng.normal(size=(b, p, proto_h, proto_w)).astype(np.float32)

    valid = np.ones((b, m), bool)
    truth_cls = rng.integers(1, 3, size=(b, m)).astype(np.int64)
    # A grid of medium boxes, each matching many anchors.
    centers = np.stack(np.meshgrid(
        np.linspace(0.25, 0.75, 2), np.linspace(0.15, 0.9, 4),
    ), -1).reshape(1, m, 2).astype(np.float32)
    sizes = np.full((b, m, 2), 0.2, np.float32)
    truth_box = np.concatenate([centers, sizes], -1)

    iou = np.asarray(iou_matrix(jnp.asarray(anchors[None]),
                                jnp.asarray(truth_box)))
    n_pos = int((iou.max(axis=2) >= ref_cfg.iou_pos_threshold).sum())
    assert n_pos > 64, f"scene not crowded enough: {n_pos} positives"

    seg = np.full((b, in_h, in_w), 255, np.uint8)
    for bi in range(b):
        for mi in range(m):
            cy, cx, hh, ww = truth_box[bi, mi]
            y0, y1 = int((cy - hh / 2) * in_h), int((cy + hh / 2) * in_h)
            x0, x1 = int((cx - ww / 2) * in_w), int((cx + ww / 2) * in_w)
            seg[bi, max(y0, 0):y1, max(x0, 0):x1] = mi
    img_valid = seg != 254

    ref_prediction = (
        torch.from_numpy(classification),
        torch.from_numpy(box_encoding),
        torch.from_numpy(mask_coeff),
        torch.from_numpy(anchors[None]),
        torch.from_numpy(prototype),
    )
    ref_truth = (
        torch.from_numpy(valid),
        torch.from_numpy(truth_cls.astype(np.uint8)),
        torch.from_numpy(truth_box),
        torch.from_numpy(seg.astype(np.int64)),
        torch.from_numpy(img_valid),
    )
    _, (ref_cls, ref_box, ref_mask) = ref_loss(
        ref_prediction, ref_truth, ref_cfg
    )

    my_prediction = YolactPrediction(
        classification=jnp.asarray(classification),
        box_encoding=jnp.asarray(box_encoding),
        mask_coeff=jnp.asarray(mask_coeff),
        anchor=jnp.asarray(anchors),
        mask_prototype=jnp.asarray(np.moveaxis(prototype, 1, -1)),
    )
    my_truth = YolactTruth(
        valid=jnp.asarray(valid),
        classification=jnp.asarray(truth_cls.astype(np.int32)),
        box=jnp.asarray(truth_box),
        seg_map=jnp.asarray(seg.astype(np.int32)),
        img_valid=jnp.asarray(img_valid),
    )

    def train_cfg(cap):
        return YolactTrainConfig(
            lr=1e-3, momentum=0.9, weight_decay=0, grad_max_norm=1,
            n_epochs=1, batch_size=b, epoch_n_batches=1,
            max_objects=m, max_positive_anchors=cap,
        )

    exact = yolact_loss(my_prediction, my_truth, my_cfg, train_cfg(None))
    np.testing.assert_allclose(
        float(exact.classification), float(ref_cls), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        float(exact.box), float(ref_box), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        float(exact.mask), float(ref_mask), atol=2e-3, rtol=2e-3
    )
    assert int(exact.mask_clipped) == 0

    capped = yolact_loss(my_prediction, my_truth, my_cfg, train_cfg(64))
    assert int(capped.mask_clipped) == n_pos - 64
    # The capped mask loss diverges on this scene — that's exactly why
    # the clip count must be surfaced.
    assert float(capped.mask) != float(exact.mask)


def test_nms_parity_with_reference():
    from tauv_vision.yolact.model.nms import nms as ref_nms

    from tauv_vision_tpu.ops.nms import fast_nms

    rng = np.random.default_rng(2)
    n = 40
    box = np.concatenate(
        [rng.uniform(0.2, 0.8, (1, n, 2)), rng.uniform(0.1, 0.4, (1, n, 2))],
        -1,
    ).astype(np.float32)
    cls = rng.normal(size=(1, n, 4)).astype(np.float32)

    kept_ref = ref_nms(
        torch.from_numpy(cls), torch.from_numpy(box),
        top_k=15, iou_threshold=0.5, confidence_threshold=0.3,
    ).numpy()

    idx, keep = fast_nms(jnp.asarray(cls), jnp.asarray(box), 15, 0.5, 0.3)
    kept_mine = np.asarray(idx[0])[np.asarray(keep[0])]
    np.testing.assert_array_equal(np.sort(kept_mine), np.sort(kept_ref))


def test_centernet_decode_parity_with_reference():
    """Full plain-decode chain on identical prediction maps."""
    # Stub matplotlib use inside reference decode import chain is fine.
    from tauv_vision.centernet.model import decode as ref_decode

    from tauv_vision_tpu.configs import CenternetModelConfig
    from tauv_vision_tpu.models.centernet import Prediction as MyPrediction
    from tauv_vision_tpu.serving.centernet_decode import decode as my_decode

    rng = np.random.default_rng(3)
    b, n_labels, h, w = 2, 3, 16, 24
    heatmap = (rng.normal(size=(b, n_labels, h, w)) * 2).astype(np.float32)
    size = rng.uniform(0.05, 0.4, (b, h, w, 2)).astype(np.float32)
    offset = rng.uniform(0, 4, (b, h, w, 2)).astype(np.float32)

    class RefPrediction:
        pass

    ref_pred = RefPrediction()
    ref_pred.heatmap = torch.from_numpy(heatmap)
    ref_pred.size = torch.from_numpy(size)
    ref_pred.offset = torch.from_numpy(offset)
    ref_pred.depth = None
    ref_pred.roll_bin = None
    ref_pred.pitch_bin = None
    ref_pred.yaw_bin = None

    class RefConfig:
        in_h = 64
        in_w = 96
        downsample_ratio = 4
        out_h = 16
        out_w = 24

    ref_detections = ref_decode.decode(
        ref_pred, RefConfig(), n_detections=5, score_threshold=0.3
    )

    my_config = CenternetModelConfig(
        in_h=64, in_w=96, backbone_heights=(1,), backbone_channels=(8, 8),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    my_pred = MyPrediction(
        heatmap=jnp.asarray(np.transpose(heatmap, (0, 2, 3, 1))),
        keypoint_heatmap=None, keypoint_affinity=None,
        size=jnp.asarray(size), offset=jnp.asarray(offset),
        roll_bin=None, roll_offset=None, pitch_bin=None, pitch_offset=None,
        yaw_bin=None, yaw_offset=None, depth=None,
    )
    mine = my_decode(my_pred, my_config, n_detections=5, score_threshold=0.3)

    for bi in range(b):
        ref_sample = ref_detections[bi]
        n_valid = int(np.asarray(mine.valid[bi]).sum())
        assert n_valid == len(ref_sample)
        for di, ref_det in enumerate(ref_sample):
            assert int(mine.label[bi, di]) == int(ref_det.label)
            np.testing.assert_allclose(
                float(mine.score[bi, di]), float(ref_det.score), atol=1e-3
            )
            np.testing.assert_allclose(
                float(mine.y[bi, di]), float(ref_det.y), atol=1e-3
            )
            np.testing.assert_allclose(
                float(mine.x[bi, di]), float(ref_det.x), atol=1e-3
            )
            np.testing.assert_allclose(
                float(mine.h[bi, di]), float(ref_det.h), atol=1e-3
            )
            np.testing.assert_allclose(
                float(mine.w[bi, di]), float(ref_det.w), atol=1e-3
            )


def test_mask_assembly_parity_with_reference():
    from tauv_vision.yolact.model.masks import assemble_mask as ref_assemble

    from tauv_vision_tpu.ops.masks import assemble_mask as my_assemble

    rng = np.random.default_rng(4)
    proto = rng.normal(size=(4, 16, 24)).astype(np.float32)
    coeff = rng.normal(size=(3, 4)).astype(np.float32)
    box = np.concatenate(
        [rng.uniform(0.3, 0.7, (3, 2)), rng.uniform(0.2, 0.5, (3, 2))], -1
    ).astype(np.float32)

    ref = ref_assemble(
        torch.from_numpy(proto), torch.from_numpy(coeff),
        torch.from_numpy(box),
    ).numpy()
    mine = np.asarray(
        my_assemble(jnp.asarray(proto), jnp.asarray(coeff), jnp.asarray(box))
    )
    np.testing.assert_allclose(mine, ref, atol=1e-3)
