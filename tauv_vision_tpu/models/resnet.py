"""ResNet-18 feature-extractor backbone, flax.linen.

Parity target: ``yolact/model/backbone.py:9-32`` — despite the class name
``Resnet101Backbone``, the reference instantiates a torchvision
**ResNet-18** and taps the ``layer{2,3,4}.1.bn2`` nodes: the output of the
final BasicBlock's second BatchNorm *before* the residual add and final
relu.  Feature depths are (128, 256, 512).

TPU-first notes:
- NHWC activations; convs in a configurable compute dtype (bf16 for
  inference), BN statistics in f32.
- ``load_torchvision_state_dict`` converts a torchvision ``resnet18``
  checkpoint (OIHW conv kernels) into this module's param/batch_stats
  pytrees, preserving pretrained ImageNet features without any torch
  dependency at runtime.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class BasicBlock(nn.Module):
    """torchvision BasicBlock: conv3x3-bn-relu-conv3x3-bn (+ skip) - relu.

    When ``tap_pre_residual`` is set, also returns the second BN's output
    before the residual add (the reference's feature tap).
    """

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=jnp.float32,
            name=name,
        )

        identity = x
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        pre_residual = bn("bn2")(out)

        if self.downsample:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity)

        return nn.relu(pre_residual + identity), pre_residual


class Resnet18Features(nn.Module):
    """ResNet-18 trunk returning the (pre-residual bn2) taps of
    layer2/3/4, depths (128, 256, 512) at strides (8, 16, 32)."""

    dtype: jnp.dtype = jnp.float32

    depths: Tuple[int, int, int] = (128, 256, 512)
    # > 1: run the 7x7 RGB stem in space-to-depth phase form (exact
    # rewrite, same "conv1" parameter; ops/space_to_depth.py).
    stem_s2d: int = 0

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False):
        if self.stem_s2d > 1:
            from tauv_vision_tpu.models.layers import S2DStemConv

            x = S2DStemConv(
                64, 7, stride=2, f=self.stem_s2d, dtype=self.dtype,
                name="conv1",
            )(img)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                dtype=self.dtype, name="conv1",
            )(img)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=jnp.float32, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        taps = []
        plan = [(64, 1, False), (128, 2, True), (256, 2, True), (512, 2, True)]
        for layer_i, (features, stride, downsample) in enumerate(plan, start=1):
            x, _ = BasicBlock(
                features, stride, downsample, dtype=self.dtype,
                name=f"layer{layer_i}_0",
            )(x, train=train)
            x, tap = BasicBlock(
                features, 1, False, dtype=self.dtype, name=f"layer{layer_i}_1"
            )(x, train=train)
            if layer_i >= 2:
                taps.append(tap.astype(jnp.float32))

        return tuple(taps)


def _conv_kernel(weight: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(weight, (2, 3, 1, 0))


def load_torchvision_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torchvision resnet18 state_dict (tensors or ndarrays) into
    (params, batch_stats) pytrees for :class:`Resnet18Features`."""

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return v.astype(np.float32)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_conv(dst, src):
        params[dst] = {"kernel": jnp.asarray(_conv_kernel(arr(src + ".weight")))}

    def put_bn(dst, src):
        params[dst] = {
            "scale": jnp.asarray(arr(src + ".weight")),
            "bias": jnp.asarray(arr(src + ".bias")),
        }
        stats[dst] = {
            "mean": jnp.asarray(arr(src + ".running_mean")),
            "var": jnp.asarray(arr(src + ".running_var")),
        }

    put_conv("conv1", "conv1")
    put_bn("bn1", "bn1")

    def put_block(dst, src, downsample):
        block_params: Dict[str, Any] = {}
        block_stats: Dict[str, Any] = {}

        def bconv(d, s):
            block_params[d] = {"kernel": jnp.asarray(_conv_kernel(arr(s + ".weight")))}

        def bbn(d, s):
            block_params[d] = {
                "scale": jnp.asarray(arr(s + ".weight")),
                "bias": jnp.asarray(arr(s + ".bias")),
            }
            block_stats[d] = {
                "mean": jnp.asarray(arr(s + ".running_mean")),
                "var": jnp.asarray(arr(s + ".running_var")),
            }

        bconv("conv1", src + ".conv1")
        bbn("bn1", src + ".bn1")
        bconv("conv2", src + ".conv2")
        bbn("bn2", src + ".bn2")
        if downsample:
            bconv("downsample_conv", src + ".downsample.0")
            bbn("downsample_bn", src + ".downsample.1")
        params[dst] = block_params
        stats[dst] = block_stats

    for layer_i in (1, 2, 3, 4):
        for block_i in (0, 1):
            put_block(
                f"layer{layer_i}_{block_i}",
                f"layer{layer_i}.{block_i}",
                downsample=(layer_i >= 2 and block_i == 0),
            )

    return {"params": params, "batch_stats": stats}


def resnet18_feature_shapes(in_h: int, in_w: int) -> List[Tuple[int, int]]:
    """Spatial sizes of the three taps for a given input size."""
    def halve(v):
        return (v - 1) // 2 + 1

    s2 = halve(halve(in_h)), halve(halve(in_w))       # stride 4 (stem+pool)
    s3 = halve(s2[0]), halve(s2[1])                   # layer2: stride 8
    s4 = halve(s3[0]), halve(s3[1])                   # layer3: stride 16
    s5 = halve(s4[0]), halve(s4[1])                   # layer4: stride 32
    return [s3, s4, s5]


class BottleneckBlock(nn.Module):
    """torchvision ResNet Bottleneck (1x1 reduce, 3x3, 1x1 expand x4)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=jnp.float32, name=name,
        )
        out_features = self.planes * 4

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        pre_residual = bn("bn3")(out)

        if self.downsample:
            identity = nn.Conv(
                out_features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity)

        return nn.relu(pre_residual + identity), pre_residual


RESNET_LAYER_COUNTS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


class ResnetFeatures(nn.Module):
    """General ResNet trunk returning the layer2/3/4 taps (the final
    block's pre-residual bn output, like the reference's feature
    extractor).  depth in {18, 34} builds BasicBlocks (tap depths
    128/256/512); {50, 101} builds Bottlenecks (512/1024/2048) — the
    real ResNet-101 the stale yolo_pose backbone intended
    (yolo_pose/model/backbone.py, SURVEY.md §2.3)."""

    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    @property
    def tap_depths(self):
        if self.depth in (18, 34):
            return (128, 256, 512)
        return (512, 1024, 2048)

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False):
        counts = RESNET_LAYER_COUNTS[self.depth]
        bottleneck = self.depth >= 50

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(img)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=jnp.float32, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        taps = []
        planes = (64, 128, 256, 512)
        for layer_i, (p, count) in enumerate(zip(planes, counts), start=1):
            for block_i in range(count):
                stride = 2 if (block_i == 0 and layer_i > 1) else 1
                if bottleneck:
                    downsample = block_i == 0  # ch change on every layer 1st
                    x, tap = BottleneckBlock(
                        p, stride, downsample, dtype=self.dtype,
                        name=f"layer{layer_i}_{block_i}",
                    )(x, train=train)
                else:
                    downsample = block_i == 0 and layer_i > 1
                    x, tap = BasicBlock(
                        p, stride, downsample, dtype=self.dtype,
                        name=f"layer{layer_i}_{block_i}",
                    )(x, train=train)
            if layer_i >= 2:
                taps.append(tap.astype(jnp.float32))

        return tuple(taps)
