"""CenterNet loss parity against the reference's own torch code.

Runs ``tauv_vision.centernet.model.loss.loss`` (the real reference
module, from /root/reference) and our vectorized ``centernet_loss`` on
identical predictions + truth and compares every loss term.

Three reference bugs (all deliberately fixed in the rebuild) surfaced by
this comparison and accounted for below:
- ``n_valid = min(sum(valid), 1)`` instead of max (loss.py:231) — the
  test uses exactly one valid object so min == max == 1;
- the angle losses are summed to a scalar BEFORE the validity masking,
  so ``(valid * scalar).sum()`` multiplies by the valid count and also
  includes padded objects' losses (loss.py:272-273) — with one object
  the factors collapse;
- ``l = l_heatmap`` aliases the running total onto ``losses.heatmap``
  and every subsequent ``l += term`` mutates it in place (loss.py:236+),
  so the reference's reported heatmap component IS its total — the test
  reconstructs the true component by subtracting the other terms.
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
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        v2 = types.ModuleType("torchvision.transforms.v2")
        for name in ("ToImageTensor", "ConvertImageDtype", "Compose",
                     "ToTensor", "Resize", "Normalize"):
            setattr(v2, name, lambda *a, **k: None)
        tr.v2 = v2
        tv.transforms = tr
        ops = types.ModuleType("torchvision.ops")
        ops.DeformConv2d = object
        tv.ops = ops
        models = types.ModuleType("torchvision.models")
        tv.models = models
        sys.modules.update(
            {
                "torchvision": tv,
                "torchvision.transforms": tr,
                "torchvision.transforms.v2": v2,
                "torchvision.ops": ops,
                "torchvision.models": models,
            }
        )
    if "spatialmath" not in sys.modules:
        sm = types.ModuleType("spatialmath")
        sm.SE3 = object
        sm.SO3 = object
        sys.modules["spatialmath"] = sm
    yield
    sys.path.remove(REFERENCE)


IN_H, IN_W, RATIO = 64, 96, 4
OUT_H, OUT_W = IN_H // RATIO, IN_W // RATIO


class _Bag:
    """Attribute bag standing in for the reference dataclasses."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


@pytest.mark.slow
def test_centernet_loss_parity_with_reference():
    from tauv_vision.centernet.model.config import (
        AngleConfig as RefAngleConfig,
        ModelConfig as RefModelConfig,
        ObjectConfig as RefObjectConfig,
        ObjectConfigSet as RefObjectConfigSet,
        TrainConfig as RefTrainConfig,
    )
    from tauv_vision.centernet.model.loss import loss as ref_loss

    from tauv_vision_tpu.configs import (
        AngleConfig,
        CenternetModelConfig,
        CenternetTrainConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centernet import Prediction
    from tauv_vision_tpu.train.centernet_task import (
        CenternetTruth,
        centernet_loss,
    )

    rng = np.random.default_rng(0)
    b, n_obj, n_labels = 1, 1, 2  # exactly ONE valid object total: the
    # reference's min-vs-max n_valid and angle double-count factors both
    # collapse to 1 (see module docstring).
    n_keypoints = 3

    ref_object_config = RefObjectConfigSet(
        configs=[
            RefObjectConfig(
                id="a",
                yaw=RefAngleConfig(train=True, modulo=2 * pi),
                pitch=RefAngleConfig(train=False, modulo=2 * pi),
                roll=RefAngleConfig(train=False, modulo=2 * pi),
                train_depth=True,
                train_keypoints=True,
                keypoints=[(0, 0, 0), (0.1, 0, 0)],
            ),
            RefObjectConfig(
                id="b",
                yaw=RefAngleConfig(train=True, modulo=pi / 2),
                pitch=RefAngleConfig(train=False, modulo=2 * pi),
                roll=RefAngleConfig(train=False, modulo=2 * pi),
                train_depth=True,
                train_keypoints=True,
                keypoints=[(0, 0.1, 0)],
            ),
        ]
    )
    ref_model_config = RefModelConfig(
        backbone_heights=[1], backbone_channels=[8, 8],
        in_h=IN_H, in_w=IN_W, downsamples=2, angle_bin_overlap=pi / 3,
    )
    ref_train_config = RefTrainConfig(
        lr=1e-4, batch_size=b, n_batches=0, n_epochs=1,
        heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
        heatmap_sigma_factor=0.1,
        keypoint_heatmap_sigma=1.5, keypoint_affinity_sigma=2.0,
        loss_lambda_keypoint_heatmap=0.7, loss_lambda_keypoint_affinity=0.02,
        loss_lambda_size=0.1, loss_lambda_offset=0.05,
        loss_lambda_angle=0.2, loss_lambda_depth=0.3,
        n_workers=0, weight_save_interval=1,
    )

    # ---- shared random prediction + truth -----------------------------
    heatmap = (rng.normal(size=(b, n_labels, OUT_H, OUT_W)) * 2).astype(
        np.float32
    )
    kp_heatmap = (rng.normal(size=(b, n_keypoints, OUT_H, OUT_W)) * 2).astype(
        np.float32
    )
    kp_affinity = rng.normal(
        size=(b, n_keypoints, 2, OUT_H, OUT_W)
    ).astype(np.float32)
    size_map = rng.uniform(0, 0.5, (b, OUT_H, OUT_W, 2)).astype(np.float32)
    offset_map = rng.uniform(0, 4, (b, OUT_H, OUT_W, 2)).astype(np.float32)
    yaw_bin = rng.normal(size=(b, OUT_H, OUT_W, 4)).astype(np.float32)
    yaw_offset = rng.normal(size=(b, OUT_H, OUT_W, 4)).astype(np.float32)
    depth_map = rng.normal(size=(b, OUT_H, OUT_W, 1)).astype(np.float32)

    valid = np.ones((b, n_obj), bool)
    label = np.asarray([[0]], np.int64)
    center = rng.uniform(0.15, 0.85, (b, n_obj, 2)).astype(np.float32)
    size_t = rng.uniform(0.1, 0.4, (b, n_obj, 2)).astype(np.float32)
    yaw_t = rng.uniform(0, 2 * pi, (b, n_obj)).astype(np.float32)
    depth_t = rng.uniform(0.5, 4.0, (b, n_obj)).astype(np.float32)

    kp_valid = np.ones((b, 2), bool)
    kp_label = np.asarray([[0, 2]], np.int64)
    kp_center = rng.uniform(0.1, 0.9, (b, 2, 2)).astype(np.float32)
    kp_obj_index = np.zeros((b, 2), np.int64)

    # ---- reference (torch) --------------------------------------------
    ref_prediction = _Bag(
        heatmap=torch.from_numpy(heatmap),
        keypoint_heatmap=torch.from_numpy(kp_heatmap),
        keypoint_affinity=torch.from_numpy(kp_affinity),
        size=torch.from_numpy(size_map),
        offset=torch.from_numpy(offset_map),
        roll_bin=None, roll_offset=None,
        pitch_bin=None, pitch_offset=None,
        yaw_bin=torch.from_numpy(yaw_bin),
        yaw_offset=torch.from_numpy(yaw_offset),
        depth=torch.from_numpy(depth_map),
    )
    ref_truth = _Bag(
        valid=torch.from_numpy(valid),
        label=torch.from_numpy(label),
        center=torch.from_numpy(center),
        size=torch.from_numpy(size_t),
        roll=torch.zeros((b, n_obj)),
        pitch=torch.zeros((b, n_obj)),
        yaw=torch.from_numpy(yaw_t),
        depth=torch.from_numpy(depth_t),
        keypoint_valid=torch.from_numpy(kp_valid),
        keypoint_label=torch.from_numpy(kp_label),
        keypoint_center=torch.from_numpy(kp_center),
        keypoint_object_index=torch.from_numpy(kp_obj_index),
    )
    ref = ref_loss(
        ref_prediction, ref_truth, ref_model_config, ref_train_config,
        ref_object_config, img=None,
    )

    # ---- ours (jax) -----------------------------------------------------
    object_config = ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="a",
                yaw=AngleConfig(train=True, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=2 * pi),
                roll=AngleConfig(train=False, modulo=2 * pi),
                train_depth=True, train_keypoints=True,
                keypoints=((0, 0, 0), (0.1, 0, 0)),
            ),
            ObjectConfig(
                id="b",
                yaw=AngleConfig(train=True, modulo=pi / 2),
                pitch=AngleConfig(train=False, modulo=2 * pi),
                roll=AngleConfig(train=False, modulo=2 * pi),
                train_depth=True, train_keypoints=True,
                keypoints=((0, 0.1, 0),),
            ),
        )
    )
    model_config = CenternetModelConfig(
        in_h=IN_H, in_w=IN_W, backbone_heights=(1,), backbone_channels=(8, 8),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    train_config = CenternetTrainConfig(
        lr=1e-4, batch_size=b, n_batches=0, n_epochs=1,
        heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
        heatmap_sigma_factor=0.1,
        keypoint_heatmap_sigma=1.5, keypoint_affinity_sigma=2.0,
        loss_lambda_keypoint_heatmap=0.7, loss_lambda_keypoint_affinity=0.02,
        loss_lambda_size=0.1, loss_lambda_offset=0.05,
        loss_lambda_angle=0.2, loss_lambda_depth=0.3,
        max_objects=n_obj, max_keypoints=2,
    )
    my_prediction = Prediction(
        heatmap=jnp.asarray(np.transpose(heatmap, (0, 2, 3, 1))),
        keypoint_heatmap=jnp.asarray(np.transpose(kp_heatmap, (0, 2, 3, 1))),
        keypoint_affinity=jnp.asarray(
            np.transpose(kp_affinity, (0, 3, 4, 1, 2))
        ),
        size=jnp.asarray(size_map),
        offset=jnp.asarray(offset_map),
        roll_bin=None, roll_offset=None, pitch_bin=None, pitch_offset=None,
        yaw_bin=jnp.asarray(yaw_bin),
        yaw_offset=jnp.asarray(yaw_offset),
        depth=jnp.asarray(depth_map),
    )
    my_truth = CenternetTruth(
        valid=jnp.asarray(valid),
        label=jnp.asarray(label.astype(np.int32)),
        center=jnp.asarray(center),
        size=jnp.asarray(size_t),
        roll=jnp.zeros((b, n_obj)),
        pitch=jnp.zeros((b, n_obj)),
        yaw=jnp.asarray(yaw_t),
        depth=jnp.asarray(depth_t),
        keypoint_valid=jnp.asarray(kp_valid),
        keypoint_label=jnp.asarray(kp_label.astype(np.int32)),
        keypoint_center=jnp.asarray(kp_center),
        keypoint_object_index=jnp.asarray(kp_obj_index.astype(np.int32)),
    )
    mine = centernet_loss(
        my_prediction, my_truth, model_config, train_config, object_config
    )

    # ref.heatmap aliases ref.total (in-place += bug); reconstruct the
    # true reference heatmap component.
    ref_heatmap = float(ref.total) - sum(
        float(v) for v in (
            ref.keypoint_heatmap, ref.keypoint_affinity, ref.size,
            ref.offset, ref.yaw, ref.depth,
        )
    )
    pairs = [
        ("heatmap", mine.heatmap, ref_heatmap),
        ("keypoint_heatmap", mine.keypoint_heatmap, ref.keypoint_heatmap),
        ("keypoint_affinity", mine.keypoint_affinity, ref.keypoint_affinity),
        ("size", mine.size, ref.size),
        ("offset", mine.offset, ref.offset),
        ("yaw", mine.yaw, ref.yaw),
        ("depth", mine.depth, ref.depth),
        ("total", mine.total, ref.total),
    ]
    # (with one valid object the normalization factors agree, so every
    # non-aliased component and the total must match)
    for name, got, want in pairs:
        np.testing.assert_allclose(
            float(got), float(want), rtol=2e-3, atol=2e-3, err_msg=name
        )
