"""Prototype mask network ("Masknet").

Parity target: ``yolact/model/masknet.py:8-55`` — conv stacks with two
ConvTranspose 2x upsamples (kernel 3, stride 2, padding 1, output size
forced to exactly 2x => output_padding 1), leaky-relu everywhere including
the final 1x1 output layer.
"""

from __future__ import annotations

import flax.linen as nn

# Non-backbone convs are xavier-uniform initialized like the
# reference (yolact/model/weights.py:14-23).
import functools as _functools
Conv = _functools.partial(
    nn.Conv, kernel_init=nn.initializers.xavier_uniform()
)
import jax.numpy as jnp

from tauv_vision_tpu.models.layers import TorchConvTranspose


class Protonet(nn.Module):
    feature_depth: int
    n_prototype_masks: int
    n_layers_pre_upsample: int = 1
    n_layers_post_upsample: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fpn_output: jnp.ndarray) -> jnp.ndarray:
        x = fpn_output

        def conv_stack(x, count, prefix):
            for i in range(count):
                x = Conv(
                    self.feature_depth, (3, 3), padding=1, dtype=self.dtype,
                    name=f"{prefix}_{i}",
                )(x)
                x = nn.leaky_relu(x)
            return x

        x = conv_stack(x, self.n_layers_pre_upsample, "pre")
        x = TorchConvTranspose(
            self.feature_depth, kernel_size=3, stride=2, padding=1,
            output_padding=1, dtype=self.dtype, name="upsample_1",
        )(x)
        x = nn.leaky_relu(x)
        x = conv_stack(x, self.n_layers_post_upsample, "mid")
        x = TorchConvTranspose(
            self.feature_depth, kernel_size=3, stride=2, padding=1,
            output_padding=1, dtype=self.dtype, name="upsample_2",
        )(x)
        x = nn.leaky_relu(x)
        x = conv_stack(x, self.n_layers_post_upsample, "post")
        x = Conv(
            self.n_prototype_masks, (1, 1), dtype=self.dtype, name="output"
        )(x)
        return nn.leaky_relu(x).astype(jnp.float32)
