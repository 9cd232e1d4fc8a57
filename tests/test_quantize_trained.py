"""int8 PTQ accuracy on a trained model: after training CenterNet on the
synthetic squares task, the quantized pipeline must produce the same
detections (labels + peak cells) and closely matching scores."""

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
)
from tauv_vision_tpu.data.synthetic import SquareDatasetConfig, generate_square_batch
from tauv_vision_tpu.models.centernet import Centernet
from tauv_vision_tpu.serving.centernet_decode import decode
from tauv_vision_tpu.serving.quantize import calibrate, quantized_call
from tauv_vision_tpu.train import TrainState, adam_with_clip, make_centernet_train_step


@pytest.mark.slow
def test_quantized_trained_model_detections_match():
    object_config = ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="square",
                yaw=AngleConfig(train=False, modulo=None),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=False, train_keypoints=False, keypoints=None,
            ),
        )
    )
    model_config = CenternetModelConfig(
        in_h=64, in_w=64, backbone_heights=(1, 1),
        backbone_channels=(16, 16, 32), downsamples=2,
        angle_bin_overlap=pi / 3,
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

    rng = np.random.default_rng(0)
    data_cfg = SquareDatasetConfig(in_h=64, in_w=64, max_objects=1, rotate=False)
    img_np, truth = generate_square_batch(rng, 4, data_cfg)
    img = jnp.asarray(img_np)
    truth = jax.tree_util.tree_map(jnp.asarray, truth)

    variables = model.init(jax.random.key(0), img, train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(train_config.lr, 1.0),
    )
    step = make_centernet_train_step(
        model, model_config, train_config, object_config
    )
    for _ in range(120):
        state, losses = step(state, img, truth)
    assert np.isfinite(float(losses.total))

    inference_variables = {
        "params": state.params, "batch_stats": state.batch_stats
    }

    def forward(frames):
        prediction = model.apply(inference_variables, frames, train=False)
        return decode(prediction, model_config, n_detections=2,
                      score_threshold=0.3)

    ref = forward(img)

    scales = calibrate(forward, [img], min_in_channels=8)
    assert len(scales) > 10
    qfn = jax.jit(quantized_call(forward, scales, min_in_channels=8))
    quant = qfn(img)

    # Top detection per sample: same validity, same peak neighborhood.
    assert (np.asarray(quant.valid[:, 0]) == np.asarray(ref.valid[:, 0])).all()
    np.testing.assert_allclose(
        np.asarray(quant.score[:, 0]), np.asarray(ref.score[:, 0]), atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(quant.y[:, 0]), np.asarray(ref.y[:, 0]), atol=2 / 16
    )
    np.testing.assert_allclose(
        np.asarray(quant.x[:, 0]), np.asarray(ref.x[:, 0]), atol=2 / 16
    )
    np.testing.assert_allclose(
        np.asarray(quant.h[:, 0]), np.asarray(ref.h[:, 0]), atol=0.1
    )
