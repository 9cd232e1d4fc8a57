"""End-to-end training integration tests on synthetic data.

Rebuilds the *intent* of the reference's stale synthetic test
(tests/centernet_square_detection.py) and overfit harnesses
(*/scripts/train_single_batch.py) as real automated checks: train N
steps, assert the loss decreases and the decode locks onto the target.
"""

from math import pi

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.configs import (
    AngleConfig,
    CenternetModelConfig,
    CenternetTrainConfig,
    ObjectConfig,
    ObjectConfigSet,
    YolactModelConfig,
    YolactTrainConfig,
)
from tauv_vision_tpu.data.synthetic import SquareDatasetConfig, generate_square_batch
from tauv_vision_tpu.models.centernet import Centernet
from tauv_vision_tpu.models.yolact import Yolact
from tauv_vision_tpu.ops.peaks import peak_decode
from tauv_vision_tpu.train import (
    TrainState,
    YolactTruth,
    adam_with_clip,
    make_centernet_train_step,
    make_yolact_train_step,
)

IN_H = IN_W = 64


def _square_object_config(train_yaw: bool) -> ObjectConfigSet:
    return ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="square",
                yaw=AngleConfig(train=train_yaw, modulo=pi / 2),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=False,
                train_keypoints=False,
                keypoints=None,
            ),
        )
    )


def _centernet_setup(train_yaw: bool):
    object_config = _square_object_config(train_yaw)
    model_config = CenternetModelConfig(
        in_h=IN_H, in_w=IN_W,
        backbone_heights=(1, 1), backbone_channels=(16, 16, 32),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    train_config = CenternetTrainConfig(
        lr=2e-3, batch_size=4, n_batches=0, n_epochs=1,
        heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
        heatmap_sigma_factor=0.1,
        keypoint_heatmap_sigma=1.5, keypoint_affinity_sigma=1.5,
        loss_lambda_keypoint_heatmap=1.0, loss_lambda_keypoint_affinity=0.01,
        loss_lambda_size=0.1, loss_lambda_offset=0.0,
        loss_lambda_angle=0.1, loss_lambda_depth=0.0,
        max_objects=2,
    )
    model = Centernet(
        object_config=object_config,
        backbone_heights=model_config.backbone_heights,
        backbone_channels=model_config.backbone_channels,
        downsamples=model_config.downsamples,
    )
    return model, model_config, train_config, object_config


@pytest.mark.slow
def test_centernet_learns_squares():
    """Single-batch overfit: loss drops and the decoded peak lands on the
    square's center cell (the reference test's visual check made exact)."""
    model, model_config, train_config, object_config = _centernet_setup(
        train_yaw=True
    )

    rng = np.random.default_rng(0)
    data_cfg = SquareDatasetConfig(in_h=IN_H, in_w=IN_W, max_objects=1,
                                   rotate=True)
    img_np, truth = generate_square_batch(rng, 4, data_cfg)
    img = jnp.asarray(img_np)
    truth = jax.tree_util.tree_map(jnp.asarray, truth)

    variables = model.init(jax.random.key(0), img, train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(train_config.lr, 1.0),
    )

    step = make_centernet_train_step(
        model, model_config, train_config, object_config
    )

    first_loss = None
    for i in range(150):
        state, losses = step(state, img, truth)
        if first_loss is None:
            first_loss = float(losses.total)
    final_loss = float(losses.total)

    assert np.isfinite(final_loss)
    assert final_loss < 0.5 * first_loss, (first_loss, final_loss)

    # Decode: the top peak must sit on the truth center cell (+-1 cell).
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred = model.apply(variables, img, train=False)
    index, label, score = peak_decode(pred.heatmap_nchw(), n_detections=4)
    out_h = IN_H // model_config.downsample_ratio
    out_w = IN_W // model_config.downsample_ratio
    hits = 0
    for b in range(4):
        cy = int(np.floor(float(truth.center[b, 0, 0]) * out_h))
        cx = int(np.floor(float(truth.center[b, 0, 1]) * out_w))
        py, px = int(index[b, 0, 0]), int(index[b, 0, 1])
        if abs(py - cy) <= 1 and abs(px - cx) <= 1:
            hits += 1
    assert hits >= 3, f"peaks off-center: {hits}/4"


def _make_yolact_truth(rng, batch_size, n_objects, in_h, in_w):
    """Paint axis-aligned boxes as instance segments."""
    valid = np.zeros((batch_size, n_objects), bool)
    classification = np.zeros((batch_size, n_objects), np.int32)
    box = np.zeros((batch_size, n_objects, 4), np.float32)
    seg = np.full((batch_size, in_h, in_w), 255, np.int32)
    img = rng.uniform(0, 0.3, (batch_size, in_h, in_w, 3)).astype(np.float32)

    for b in range(batch_size):
        for i in range(n_objects):
            h = rng.uniform(0.3, 0.5)
            w = rng.uniform(0.3, 0.5)
            cy = rng.uniform(h / 2, 1 - h / 2)
            cx = rng.uniform(w / 2, 1 - w / 2)
            box[b, i] = (cy, cx, h, w)
            valid[b, i] = True
            classification[b, i] = 1 + int(rng.integers(0, 2))
            y0, y1 = int((cy - h / 2) * in_h), int((cy + h / 2) * in_h)
            x0, x1 = int((cx - w / 2) * in_w), int((cx + w / 2) * in_w)
            seg[b, y0:y1, x0:x1] = i
            img[b, y0:y1, x0:x1, classification[b, i] - 1] = 1.0

    truth = YolactTruth(
        valid=jnp.asarray(valid),
        classification=jnp.asarray(classification),
        box=jnp.asarray(box),
        seg_map=jnp.asarray(seg),
        img_valid=jnp.ones((batch_size, in_h, in_w), bool),
    )
    return jnp.asarray(img), truth


@pytest.mark.slow
def test_yolact_single_batch_overfit():
    """Reference overfit harness intent (yolact/scripts/train_single_batch
    and the 1000-iteration loop in model.py:138-149), shortened."""
    cfg = YolactModelConfig(
        in_w=IN_W, in_h=IN_H, feature_depth=16, n_classes=2,
        n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(12, 24, 48, 96, 192), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.4,
        iou_neg_threshold=0.3, negative_example_ratio=3,
    )
    tcfg = YolactTrainConfig(
        lr=1e-3, momentum=0.9, weight_decay=0.0, grad_max_norm=1.0,
        n_epochs=1, batch_size=2, epoch_n_batches=1,
        max_objects=2, max_positive_anchors=16,
    )

    rng = np.random.default_rng(1)
    img, truth = _make_yolact_truth(rng, 2, 2, IN_H, IN_W)

    model = Yolact(cfg)
    variables = model.init(jax.random.key(0), img, train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(tcfg.lr, tcfg.grad_max_norm),
    )

    step = make_yolact_train_step(model, cfg, tcfg)

    losses_log = []
    for i in range(60):
        state, losses = step(state, img, truth)
        losses_log.append(float(losses.total))

    assert np.isfinite(losses_log[-1])
    assert losses_log[-1] < 0.6 * losses_log[0], (losses_log[0], losses_log[-1])
    # All components engaged and finite.
    for field in ("classification", "box", "mask"):
        assert np.isfinite(float(getattr(losses, field)))


@pytest.mark.slow
def test_centernet_train_step_dp_mesh():
    """The same train step under an 8-way data-parallel mesh produces a
    finite loss and replicated state (SURVEY.md §2.9 DP requirement)."""
    from tauv_vision_tpu.parallel import create_mesh, replicate, shard_batch

    model, model_config, train_config, object_config = _centernet_setup(
        train_yaw=False
    )

    mesh = create_mesh()
    assert mesh.shape["data"] == 8

    rng = np.random.default_rng(2)
    data_cfg = SquareDatasetConfig(in_h=IN_H, in_w=IN_W, max_objects=2)
    img_np, truth = generate_square_batch(rng, 8, data_cfg)

    variables = model.init(jax.random.key(0), jnp.asarray(img_np[:1]), train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(train_config.lr, 1.0),
    )

    state = replicate(state, mesh)
    img = shard_batch(jnp.asarray(img_np), mesh)
    truth = shard_batch(jax.tree_util.tree_map(jnp.asarray, truth), mesh)

    step = make_centernet_train_step(
        model, model_config, train_config, object_config, mesh=mesh
    )
    state, losses = step(state, img, truth)
    state, losses = step(state, img, truth)
    assert np.isfinite(float(losses.total))
