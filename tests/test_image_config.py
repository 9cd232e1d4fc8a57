"""Image-op parity with torch and config round-trip tests."""

import json
from math import pi

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tauv_vision_tpu.configs import (
    AngleConfig,
    CenternetModelConfig,
    ClassConfig,
    ClassConfigSet,
    ObjectConfig,
    ObjectConfigSet,
    YolactModelConfig,
    get_head_channels,
)
from tauv_vision_tpu.ops import image


def test_resize_bilinear_parity_upsample():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 12, 18)).astype(np.float32)
    ours = np.asarray(image.resize_bilinear(jnp.asarray(x), (24, 36)))
    theirs = F.interpolate(
        torch.from_numpy(x), (24, 36), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_bilinear_parity_downsample():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 2, 32, 48)).astype(np.float32)
    ours = np.asarray(image.resize_bilinear(jnp.asarray(x), (13, 17)))
    theirs = F.interpolate(
        torch.from_numpy(x), (13, 17), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_nearest_parity():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 1, 20, 30)).astype(np.float32)
    for out_hw in [(40, 60), (7, 11), (20, 30)]:
        ours = np.asarray(image.resize_nearest(jnp.asarray(x), out_hw))
        theirs = F.interpolate(torch.from_numpy(x), out_hw, mode="nearest").numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_normalize_matches_torchvision():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    ours = np.asarray(image.normalize_image(jnp.asarray(img), mean, std))
    t = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1) / 255
    theirs = (
        (t - torch.tensor(mean)[:, None, None]) / torch.tensor(std)[:, None, None]
    ).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def _object_config_set():
    return ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="torpedo",
                yaw=AngleConfig(train=True, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=2 * pi),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=True,
                train_keypoints=True,
                keypoints=((0, 0, 0), (0.1, 0.2, 0.3)),
            ),
            ObjectConfig(
                id="buoy",
                yaw=AngleConfig(train=False, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=2 * pi),
                roll=AngleConfig(train=False, modulo=2 * pi),
                train_depth=False,
                train_keypoints=True,
                keypoints=((0, 0, 0),),
            ),
        )
    )


def test_object_config_set_roundtrip_and_derivation(tmp_path):
    ocs = _object_config_set()
    assert ocs.n_labels == 2
    assert ocs.n_keypoints == 3
    assert ocs.train_yaw and not ocs.train_pitch and not ocs.train_roll
    assert ocs.train_depth and ocs.train_keypoints
    assert ocs.encode_keypoint_index(1, 0) == 2
    assert ocs.decode_keypoint_index(1) == (0, 1)
    assert ocs.keypoint_owner_labels() == (0, 0, 1)
    assert ocs.label_id_to_index == {"torpedo": 0, "buoy": 1}

    path = tmp_path / "objects.json"
    ocs.save(path)
    loaded = ObjectConfigSet.load(path)
    assert loaded == ocs

    # heads: heatmap(2), kp(3), aff(6), size(2), offset(2), yaw(4,4), depth(1)
    assert get_head_channels(ocs) == (2, 3, 6, 2, 2, 4, 4, 1)


def test_centernet_model_config_roundtrip():
    cfg = CenternetModelConfig(
        in_h=360, in_w=640,
        backbone_heights=(2, 2, 2), backbone_channels=(64, 64, 64, 64),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    assert cfg.out_h == 90 and cfg.out_w == 160 and cfg.downsample_ratio == 4
    assert CenternetModelConfig.from_dict(cfg.to_dict()) == cfg
    assert hash(cfg) == hash(CenternetModelConfig.from_dict(cfg.to_dict()))


def test_yolact_config_roundtrip(tmp_path):
    cfg = YolactModelConfig(
        in_w=640, in_h=360, feature_depth=64, n_classes=2, n_prototype_masks=8,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0, n_box_layers=0,
        n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5, iou_neg_threshold=0.4,
        negative_example_ratio=3,
    )
    path = tmp_path / "model.json"
    cfg.save(path)
    assert YolactModelConfig.load(path) == cfg
    # JSON is plain-serializable (the node consumes these files at runtime).
    with open(path) as fp:
        data = json.load(fp)
    assert data["in_w"] == 640

    classes = ClassConfigSet(
        (ClassConfig("bg", 0), ClassConfig("torpedo", 1))
    )
    cpath = tmp_path / "classes.json"
    classes.save(cpath)
    loaded = ClassConfigSet.load(cpath)
    assert loaded.get_by_index(1).id == "torpedo"
    assert loaded.get_by_id("bg").index == 0
