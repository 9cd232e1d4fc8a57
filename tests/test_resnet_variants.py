"""General ResNet trunk variants (Bottleneck 50/101 + BasicBlock 18/34)."""

import jax
import jax.numpy as jnp
import pytest

from tauv_vision_tpu.models.resnet import RESNET_LAYER_COUNTS, ResnetFeatures


@pytest.mark.parametrize("depth,expect", [
    (18, (128, 256, 512)),
    (50, (512, 1024, 2048)),
])
def test_resnet_tap_depths(depth, expect):
    model = ResnetFeatures(depth=depth)
    assert model.tap_depths == expect
    img = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.key(0), img, train=False)
    taps = model.apply(variables, img, train=False)
    assert tuple(t.shape[-1] for t in taps) == expect
    # strides 8 / 16 / 32
    assert [t.shape[1:3] for t in taps] == [(8, 12), (4, 6), (2, 3)]


def test_resnet101_block_counts():
    assert RESNET_LAYER_COUNTS[101] == (3, 4, 23, 3)
