"""Feature pyramid network.

Parity target: ``yolact/model/feature_pyramid.py:8-58`` — 1x1 laterals,
bilinear-upsample top-down sum, 3x3 prediction convs + leaky-relu, then
``n_fpn_downsample_layers`` extra stride-2 conv levels (each leaky-relu'd,
chained from the previous prediction output).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn

# Non-backbone convs are xavier-uniform initialized like the
# reference (yolact/model/weights.py:14-23).
import functools as _functools
Conv = _functools.partial(
    nn.Conv, kernel_init=nn.initializers.xavier_uniform()
)
import jax.numpy as jnp

from tauv_vision_tpu.ops.image import resize_bilinear_nhwc


class FeaturePyramid(nn.Module):
    feature_depth: int
    n_downsample_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, backbone_outputs: Tuple[jnp.ndarray, ...]) -> List[jnp.ndarray]:
        n_in = len(backbone_outputs)

        laterals = [
            Conv(
                self.feature_depth, (1, 1), dtype=self.dtype, name=f"lateral_{i}"
            )(backbone_outputs[i])
            for i in range(n_in)
        ]

        pyramid = [None] * n_in
        pyramid[-1] = laterals[-1]
        for i in range(n_in - 2, -1, -1):
            target_hw = laterals[i].shape[1:3]
            above = resize_bilinear_nhwc(pyramid[i + 1], target_hw)
            pyramid[i] = laterals[i] + above

        outputs: List[jnp.ndarray] = []
        for i in range(n_in):
            out = Conv(
                self.feature_depth, (3, 3), padding=1, dtype=self.dtype,
                name=f"prediction_{i}",
            )(pyramid[i])
            outputs.append(nn.leaky_relu(out))

        for i in range(self.n_downsample_layers):
            out = Conv(
                self.feature_depth, (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype, name=f"downsample_{i}",
            )(outputs[-1])
            outputs.append(nn.leaky_relu(out))

        return outputs
