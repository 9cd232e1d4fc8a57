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

        class _SO3:
            def __init__(self, rotation):
                self.R = np.asarray(rotation, np.float64)

        class _SE3:
            @classmethod
            def Rt(cls, rotation, translation):
                obj = cls.__new__(cls)
                obj.R = rotation.R if isinstance(rotation, _SO3) else np.asarray(rotation)
                obj.t = np.asarray(translation, np.float64).reshape(3)
                return obj

        sm.SE3 = _SE3
        sm.SO3 = _SO3
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


def test_centernet_keypoint_decode_parity_with_reference():
    """The full keypoint decode chain — keypoint peak extraction, greedy
    affinity matching, PnP gating — on identical prediction maps, vs the
    reference's own ``decode_keypoints`` (decode.py:51-176).

    Documented deviations exercised here:
    - poses: the reference assigns the solved pose to the stale
      ``match_detection`` loop variable (decode.py:172), so at most ONE
      reference detection carries a pose even when several solve; we
      therefore compare OUR pose per detection against ``cv2.solvePnP``
      run directly on the reference's matched keypoint sets.
    - offsets are zero in this scene because the reference keypoint path
      ignores the offset head (decode.py:88-89) while its plain decode
      (and ours) applies it.
    """
    import cv2
    from tauv_vision.centernet.model import decode as ref_decode
    from tauv_vision.centernet.model.config import (
        AngleConfig as RefAngleConfig,
        ObjectConfig as RefObjectConfig,
        ObjectConfigSet as RefObjectConfigSet,
    )

    from tauv_vision_tpu.configs import CenternetModelConfig
    from tauv_vision_tpu.configs.centernet import (
        AngleConfig, ObjectConfig, ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centernet import Prediction as MyPrediction
    from tauv_vision_tpu.serving.centernet_decode import (
        decode_keypoints as my_decode_keypoints,
    )

    in_h, in_w, ratio = 96, 128, 4
    out_h, out_w = in_h // ratio, in_w // ratio
    f = 100.0
    projection = np.array(
        [[f, 0, in_w / 2], [0, f, in_h / 2], [0, 0, 1]], np.float64
    )

    # Object-frame keypoints: the 8 corners of a box.
    kp_local = np.array(
        [(sx, sy, sz) for sx in (-0.3, 0.3) for sy in (-0.25, 0.25)
         for sz in (-0.2, 0.2)], np.float64,
    )

    # Three class-0 objects; the third has only 5 visible keypoints so its
    # PnP must be gated out (reference: < 6 -> skip, decode.py:146).
    objects = [
        {"t": [-0.3, -0.1, 2.5], "rvec": [0.1, -0.2, 0.05],
         "slots": list(range(8)), "logit": 3.0, "kp_logit": 2.0},
        {"t": [0.5, 0.25, 3.0], "rvec": [-0.15, 0.1, 0.2],
         "slots": list(range(8)), "logit": 2.5, "kp_logit": 1.5},
        {"t": [0.05, 0.4, 2.2], "rvec": [0.05, 0.05, -0.1],
         "slots": list(range(5)), "logit": 2.2, "kp_logit": 1.0},
    ]

    def project(points):
        uv = points[:, :2] * f / points[:, 2:3]
        return uv + np.array([in_w / 2, in_h / 2])

    bg = -6.0
    b, n_labels, n_kp = 2, 2, 8
    heatmap = np.full((b, n_labels, out_h, out_w), bg, np.float32)
    kp_heatmap = np.full((b, n_kp, out_h, out_w), bg, np.float32)
    kp_affinity = np.zeros((b, n_kp, 2, out_h, out_w), np.float32)
    size = np.tile(
        np.linspace(0.1, 0.3, out_w, dtype=np.float32)[None, None, :, None],
        (b, out_h, 1, 2),
    )
    offset = np.zeros((b, out_h, out_w, 2), np.float32)

    center_cells, kp_cells = [], {}
    for obj in objects:
        rot, _ = cv2.Rodrigues(np.asarray(obj["rvec"], np.float64))
        t = np.asarray(obj["t"], np.float64)
        cu, cv_ = project(t[None])[0]
        ccell = (int(cv_ // ratio), int(cu // ratio))
        center_cells.append(ccell)
        heatmap[0, 0, ccell[0], ccell[1]] = obj["logit"]

        kp_cam = (rot @ kp_local.T).T + t
        kp_uv = project(kp_cam)
        for slot in obj["slots"]:
            u, v = kp_uv[slot]
            cell = (int(v // ratio), int(u // ratio))
            assert 0 <= cell[0] < out_h and 0 <= cell[1] < out_w
            kp_cells.setdefault(slot, []).append(cell)
            kp_heatmap[0, slot, cell[0], cell[1]] = (
                obj["kp_logit"] + 0.03 * slot
            )
            aff_y = cell[0] / out_h - ccell[0] / out_h
            aff_x = cell[1] / out_w - ccell[1] / out_w
            kp_affinity[0, slot, 0, cell[0], cell[1]] = aff_y
            kp_affinity[0, slot, 1, cell[0], cell[1]] = aff_x

    # One class-1 detection (no keypoints for that class).
    heatmap[0, 1, 4, 26] = 2.8

    # Scene sanity: 3x3 NMS must keep every engineered peak.
    for cells in ([center_cells] + list(kp_cells.values())):
        for i in range(len(cells)):
            for j in range(i + 1, len(cells)):
                assert max(abs(cells[i][0] - cells[j][0]),
                           abs(cells[i][1] - cells[j][1])) >= 2

    class RefConfig:
        pass

    ref_mc = RefConfig()
    ref_mc.in_h, ref_mc.in_w = in_h, in_w
    ref_mc.out_h, ref_mc.out_w = out_h, out_w
    ref_mc.downsample_ratio = ratio

    angle_off = RefAngleConfig(train=False, modulo=None)
    ref_oc = RefObjectConfigSet(configs=[
        RefObjectConfig(
            id="torp", yaw=angle_off, pitch=angle_off, roll=angle_off,
            train_depth=False, train_keypoints=True,
            keypoints=[tuple(kp) for kp in kp_local],
        ),
        RefObjectConfig(
            id="flat", yaw=angle_off, pitch=angle_off, roll=angle_off,
            train_depth=False, train_keypoints=False, keypoints=[],
        ),
    ])

    class RefPrediction:
        pass

    ref_pred = RefPrediction()
    ref_pred.heatmap = torch.from_numpy(heatmap)
    ref_pred.keypoint_heatmap = torch.from_numpy(kp_heatmap)
    ref_pred.keypoint_affinity = torch.from_numpy(kp_affinity)
    ref_pred.size = torch.from_numpy(size)
    ref_pred.offset = torch.from_numpy(offset)
    ref_pred.depth = None

    n_det, n_kp_det = 8, 24
    ref_out = ref_decode.decode_keypoints(
        ref_pred, ref_mc, ref_oc, projection,
        n_detections=n_det, keypoint_n_detections=n_kp_det,
        score_threshold=0.3, keypoint_score_threshold=0.3,
        keypoint_angle_threshold=0.5,
    )

    my_mc = CenternetModelConfig(
        in_h=in_h, in_w=in_w, backbone_heights=(1,),
        backbone_channels=(8, 8), downsamples=2, angle_bin_overlap=pi / 3,
    )
    my_oc = ObjectConfigSet(configs=(
        ObjectConfig(
            id="torp", yaw=AngleConfig(False, None),
            pitch=AngleConfig(False, None), roll=AngleConfig(False, None),
            train_depth=False, train_keypoints=True,
            keypoints=tuple(tuple(kp) for kp in kp_local),
        ),
        ObjectConfig(
            id="flat", yaw=AngleConfig(False, None),
            pitch=AngleConfig(False, None), roll=AngleConfig(False, None),
            train_depth=False, train_keypoints=False, keypoints=(),
        ),
    ))
    my_pred = MyPrediction(
        heatmap=jnp.asarray(np.transpose(heatmap, (0, 2, 3, 1))),
        keypoint_heatmap=jnp.asarray(np.transpose(kp_heatmap, (0, 2, 3, 1))),
        keypoint_affinity=jnp.asarray(
            np.transpose(kp_affinity, (0, 3, 4, 1, 2))
        ),
        size=jnp.asarray(size), offset=jnp.asarray(offset),
        roll_bin=None, roll_offset=None, pitch_bin=None, pitch_offset=None,
        yaw_bin=None, yaw_offset=None, depth=None,
    )
    mine = my_decode_keypoints(
        my_pred, my_mc, my_oc, jnp.asarray(projection, jnp.float32),
        n_detections=n_det, keypoint_n_detections=n_kp_det,
        score_threshold=0.3, keypoint_score_threshold=0.3,
        pnp_iterations=40,
    )

    # ---- detections ----------------------------------------------------
    ref_sample = ref_out[0]
    assert int(np.asarray(mine.detections.valid[0]).sum()) == len(ref_sample)
    for di, ref_det in enumerate(ref_sample):
        assert int(mine.detections.label[0, di]) == ref_det.label
        np.testing.assert_allclose(
            float(mine.detections.score[0, di]), ref_det.score, atol=1e-3
        )
        np.testing.assert_allclose(
            float(mine.detections.y[0, di]), ref_det.y, atol=1e-3
        )
        np.testing.assert_allclose(
            float(mine.detections.x[0, di]), ref_det.x, atol=1e-3
        )

    # ---- keypoint->detection matching ----------------------------------
    for di, ref_det in enumerate(ref_sample):
        n_slots = len(ref_det.keypoints)
        for si in range(n_slots):
            ref_kp = ref_det.keypoints[si]
            claimed = bool(mine.keypoint_valid[0, di, si])
            assert claimed == (ref_kp is not None), (di, si)
            if ref_kp is None:
                continue
            np.testing.assert_allclose(
                float(mine.keypoint_y[0, di, si]), ref_kp[0], atol=1e-3
            )
            np.testing.assert_allclose(
                float(mine.keypoint_x[0, di, si]), ref_kp[1], atol=1e-3
            )
            np.testing.assert_allclose(
                float(mine.keypoint_score[0, di, si]),
                ref_det.keypoint_scores[si], atol=1e-3,
            )

    # ---- PnP gating + pose agreement with cv2.solvePnP -----------------
    # The reference's stale-variable bug parks every solved pose on ONE
    # detection; assert that deviation is real, then check our per-
    # detection poses against cv2 run on the reference's matched sets.
    ref_with_pose = [d for d in ref_sample if d.cam_t_object is not None]
    ref_solvable = [
        d for d in ref_sample
        if sum(kp is not None for kp in d.keypoints) >= 6
    ]
    assert len(ref_solvable) == 2
    assert len(ref_with_pose) == 1  # decode.py:172 stale variable

    for di, ref_det in enumerate(ref_sample):
        solvable = sum(kp is not None for kp in ref_det.keypoints) >= 6
        assert bool(mine.pose_valid[0, di]) == solvable
        if not solvable:
            continue
        img_pts, obj_pts = [], []
        for si, kp in enumerate(ref_det.keypoints):
            if kp is None:
                continue
            img_pts.append([kp[1] * in_w, kp[0] * in_h])
            obj_pts.append(kp_local[si])
        ok, rvec, tvec = cv2.solvePnP(
            np.asarray(obj_pts), np.asarray(img_pts), projection, None,
            flags=cv2.SOLVEPNP_ITERATIVE,
        )
        assert ok
        rot_cv, _ = cv2.Rodrigues(rvec)
        np.testing.assert_allclose(
            np.asarray(mine.pose_rotation[0, di]), rot_cv, atol=3e-2
        )
        np.testing.assert_allclose(
            np.asarray(mine.pose_translation[0, di]),
            tvec.reshape(3), atol=5e-2,
        )

    # ---- empty sample ---------------------------------------------------
    assert len(ref_out[1]) == 0
    assert not bool(np.asarray(mine.detections.valid[1]).any())


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
