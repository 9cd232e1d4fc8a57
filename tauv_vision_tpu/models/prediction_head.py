"""YOLACT shared prediction head.

Parity target: ``yolact/model/prediction_head.py:9-143`` — optional extra
stages of ``relu(conv1x1(x) + bn(bottleneck(x)))`` for the shared trunk
and per-branch (class/box/mask) trunks, then 3x3 output convs producing
per-anchor class logits ``A*(C+1)``, box encodings ``A*4``, and tanh mask
coefficients ``A*P``, reshaped cell-major to ``[B, H*W*A, .]``.

One head instance is shared across every FPN level (model.py:43-53).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

# Non-backbone convs are xavier-uniform initialized like the
# reference (yolact/model/weights.py:14-23).
import functools as _functools
Conv = _functools.partial(
    nn.Conv, kernel_init=nn.initializers.xavier_uniform()
)
import jax.numpy as jnp

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class Bottleneck(nn.Module):
    """torchvision ResNet Bottleneck(inplanes=d, planes=d//4), identity
    skip (in == planes * expansion)."""

    features: int  # == inplanes == planes * 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        planes = self.features // 4
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=jnp.float32, name=name,
        )
        out = Conv(planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = Conv(planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = bn("bn3")(out)
        return nn.relu(out + x)


class ExtraStage(nn.Module):
    """relu(conv1x1(x) + bn(bottleneck(x))) (prediction_head.py:93-99)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bottleneck = Bottleneck(self.features, dtype=self.dtype,
                                name="bottleneck")(x, train=train)
        conv = Conv(self.features, (1, 1), dtype=self.dtype, name="conv")(x)
        bn = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=jnp.float32, name="bn",
        )(bottleneck)
        return nn.relu(conv + bn)


class PredictionHead(nn.Module):
    feature_depth: int
    n_classes: int
    n_prototype_masks: int
    n_anchors: int  # == len(anchor_aspect_ratios)
    n_prediction_head_layers: int = 1
    n_classification_layers: int = 0
    n_box_layers: int = 0
    n_mask_layers: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, fpn_output: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = fpn_output
        d = self.feature_depth

        for i in range(self.n_prediction_head_layers):
            x = ExtraStage(d, dtype=self.dtype, name=f"shared_{i}")(x, train=train)

        classification = x
        box_encoding = x
        mask_coeff = x

        for i in range(self.n_classification_layers):
            classification = ExtraStage(d, dtype=self.dtype, name=f"cls_{i}")(
                classification, train=train
            )
        classification = Conv(
            self.n_anchors * (self.n_classes + 1), (3, 3), padding=1,
            dtype=self.dtype, name="classification",
        )(classification)

        for i in range(self.n_box_layers):
            box_encoding = ExtraStage(d, dtype=self.dtype, name=f"box_{i}")(
                box_encoding, train=train
            )
        box_encoding = Conv(
            self.n_anchors * 4, (3, 3), padding=1, dtype=self.dtype, name="box"
        )(box_encoding)

        for i in range(self.n_mask_layers):
            mask_coeff = ExtraStage(d, dtype=self.dtype, name=f"mask_{i}")(
                mask_coeff, train=train
            )
        mask_coeff = Conv(
            self.n_anchors * self.n_prototype_masks, (3, 3), padding=1,
            dtype=self.dtype, name="mask",
        )(mask_coeff)

        b = fpn_output.shape[0]
        classification = classification.reshape(b, -1, self.n_classes + 1)
        box_encoding = box_encoding.reshape(b, -1, 4)
        mask_coeff = jnp.tanh(mask_coeff.reshape(b, -1, self.n_prototype_masks))

        return (
            classification.astype(jnp.float32),
            box_encoding.astype(jnp.float32),
            mask_coeff.astype(jnp.float32),
        )
