"""Host server adapters, plot utils, homography ops, interest-point
experiment — CPU tests."""

from math import pi

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.configs import (
    AngleConfig,
    CenternetModelConfig,
    ClassConfig,
    ClassConfigSet,
    ObjectConfig,
    ObjectConfigSet,
    YolactModelConfig,
)
from tauv_vision_tpu.models.centernet import Centernet
from tauv_vision_tpu.models.yolact import Yolact
from tauv_vision_tpu.ops.homography import get_perspective_transform, warp_perspective
from tauv_vision_tpu.serving.nodes import CenternetServer, YolactServer
from tauv_vision_tpu.utils import plot


def test_homography_identity_and_shift():
    src = jnp.asarray([[0.0, 0], [10, 0], [10, 10], [0, 10]])
    h_identity = get_perspective_transform(src, src)
    np.testing.assert_allclose(np.asarray(h_identity), np.eye(3), atol=1e-5)

    dst = src + jnp.asarray([2.0, 3.0])
    h_shift = get_perspective_transform(src, dst)
    pt = np.asarray(h_shift) @ [5, 5, 1]
    np.testing.assert_allclose(pt[:2] / pt[2], [7, 8], atol=1e-4)


def test_warp_perspective_shift():
    img = jnp.zeros((1, 16, 16, 1)).at[0, 4, 6, 0].set(1.0)
    # Shift content right by 3, down by 2.
    m = jnp.asarray([[1.0, 0, 3], [0, 1, 2], [0, 0, 1]])
    out = np.asarray(warp_perspective(img, m))
    assert out[0, 6, 9, 0] == pytest.approx(1.0, abs=1e-5)
    assert out[0, 4, 6, 0] == pytest.approx(0.0, abs=1e-5)


def test_plot_utils_render(tmp_path):
    rng = np.random.default_rng(0)
    fig = plot.plot_prototype(rng.normal(size=(4, 8, 8)))
    plot.save_plot(fig, tmp_path, "proto.png")
    assert (tmp_path / "proto.png").exists()

    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    fig = plot.plot_detection(
        img, np.asarray([1]), np.asarray([[0.5, 0.5, 0.4, 0.4]]),
        truth_valid=np.asarray([True]),
        truth_classification=np.asarray([1]),
        truth_box=np.asarray([[0.45, 0.5, 0.4, 0.4]]),
    )
    plot.save_plot(fig, tmp_path, "det.png")

    fig = plot.plot_mask(img, rng.uniform(size=(2, 16, 24)))
    plot.save_plot(fig, tmp_path, "mask.png")

    fig = plot.plot_heatmap(rng.uniform(size=(2, 16, 24)))
    plot.save_plot(fig, tmp_path, "heat.png")

    overlay = plot.plot_prediction_np(
        img, np.asarray([0]), np.asarray([0.9]),
        np.asarray([[0.5, 0.5, 0.5, 0.5]]),
        mask_np=(rng.uniform(size=(1, 32, 48)) > 0.5),
    )
    assert overlay.shape == img.shape
    assert not np.array_equal(overlay, img)


@pytest.mark.slow
def test_centernet_server_end_to_end():
    oc = ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="torpedo",
                yaw=AngleConfig(train=False, modulo=None),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=False,
                train_keypoints=True,
                keypoints=tuple((0.1 * i, 0.0, 0.0) for i in range(6)),
            ),
        )
    )
    mc = CenternetModelConfig(
        in_h=64, in_w=64, backbone_heights=(1,), backbone_channels=(8, 8),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    model = Centernet(
        object_config=oc, backbone_heights=mc.backbone_heights,
        backbone_channels=mc.backbone_channels, downsamples=mc.downsamples,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    intr = np.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])

    server = CenternetServer(
        model, variables, mc, oc, intr,
        n_detections=4, keypoint_n_detections=8,
        score_threshold=0.0,  # untrained net: accept everything
    )
    color = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3), dtype=np.uint8
    )
    depth = np.full((2, 64, 64), 2.0, np.float32)
    published = []
    out = server.process(
        color, depth,
        pose_lookup=lambda: np.eye(4),
        publish=published.append,
    )
    assert len(out) == 2 and len(published) == 2
    # With threshold 0 every slot is valid and has finite depth -> 4 each.
    assert all(len(sample) == 4 for sample in out)
    det = out[0][0]
    assert det.tag == "torpedo"
    assert det.position.shape == (3,)
    assert np.isfinite(det.position).all()


@pytest.mark.slow
def test_yolact_server_end_to_end():
    cfg = YolactModelConfig(
        in_w=64, in_h=64, feature_depth=8, n_classes=2, n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(12, 24, 48, 96, 192), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5,
        iou_neg_threshold=0.4, negative_example_ratio=3,
    )
    model = Yolact(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    classes = ClassConfigSet(
        (ClassConfig("bg", 0), ClassConfig("a", 1), ClassConfig("b", 2))
    )
    intr = np.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])

    server = YolactServer(
        model, variables, cfg, classes, intr,
        top_k=5, iou_threshold=0.5, confidence_threshold=0.0,
    )
    color = np.random.default_rng(1).integers(
        0, 255, (1, 64, 64, 3), dtype=np.uint8
    )
    depth = np.full((1, 64, 64), 1.5, np.float32)
    out = server.process(color, depth)
    assert len(out) == 1
    for det in out[0]:
        assert det.tag in ("a", "b")
        assert np.isfinite(det.position).all()
    assert server.last_latency > 0


@pytest.mark.slow
def test_interest_point_experiment_runs():
    from tauv_vision_tpu.experiments.contrastive_interest_points import (
        train_interest_points,
    )

    rng = np.random.default_rng(0)
    images = [rng.uniform(0, 1, (224, 224, 3)).astype(np.float32)]
    model, params, losses = train_interest_points(
        images, n_epochs=2, n_warps=2, lr=1e-4
    )
    assert len(losses) == 2
    assert all(np.isfinite(loss) for loss in losses)
