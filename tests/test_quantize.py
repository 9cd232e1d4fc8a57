"""int8 post-training quantization tests (mechanism + model-level)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.serving.quantize import calibrate, quantized_call


def test_quantized_conv_matches_float_closely():
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(32, (3, 3), padding=1, name="c1")(x)
            x = nn.relu(x)
            x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, name="c2")(x)
            x = nn.relu(x)
            x = nn.Conv(8, (1, 1), name="c3")(x)
            return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16)).astype(np.float32))
    net = Net()
    variables = net.init(jax.random.key(0), x)
    apply_fn = lambda b: net.apply(variables, b)  # noqa: E731

    scales = calibrate(apply_fn, [x], min_in_channels=8)
    assert set(scales) == {"c1", "c2", "c3"}

    qfn = jax.jit(quantized_call(apply_fn, scales, min_in_channels=8))
    ref = np.asarray(apply_fn(x))
    quant = np.asarray(qfn(x))
    rel = np.abs(quant - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_min_in_channels_skips_stem():
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(32, (3, 3), padding=1, name="stem")(x)  # from 3ch
            x = nn.Conv(32, (3, 3), padding=1, name="deep")(x)
            return x

    x = jnp.ones((1, 8, 8, 3))
    net = Net()
    variables = net.init(jax.random.key(0), x)
    scales = calibrate(
        lambda b: net.apply(variables, b), [x], min_in_channels=16
    )
    assert "stem" not in scales and "deep" in scales


@pytest.mark.slow
def test_yolact_pipeline_quantizes():
    """The full YOLACT forward quantizes end-to-end and stays close to the
    bf16 output on the small config."""
    from tauv_vision_tpu.configs import YolactModelConfig
    from tauv_vision_tpu.models.yolact import Yolact

    cfg = YolactModelConfig(
        in_w=64, in_h=64, feature_depth=16, n_classes=2, n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(12, 24, 48, 96, 192), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5,
        iou_neg_threshold=0.4, negative_example_ratio=3,
    )
    model = Yolact(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    apply_fn = lambda b: model.apply(variables, b, train=False)  # noqa: E731

    scales = calibrate(apply_fn, [x])
    assert len(scales) > 10  # backbone + fpn + heads + protonet

    qfn = jax.jit(quantized_call(apply_fn, scales))
    ref = apply_fn(x)
    quant = qfn(x)

    # Class logits drive decisions; compare them (untrained nets amplify
    # quantization noise through BN, so the bar is loose but bounded).
    ref_cls = np.asarray(ref.classification)
    q_cls = np.asarray(quant.classification)
    rel = np.abs(q_cls - ref_cls).max() / (np.abs(ref_cls).max() + 1e-9)
    assert np.isfinite(q_cls).all()
    assert rel < 0.5, rel
