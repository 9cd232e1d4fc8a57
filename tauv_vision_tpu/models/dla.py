"""Deep Layer Aggregation backbone (from-scratch variant), flax.linen.

Parity target: ``centernet/model/backbones/dla.py`` — stem 7x7 conv,
``downsamples`` stride-2 residual blocks, recursive Tree layers, iterative
deep aggregation (MultiIDAUp + IDAUpReverse) back up to the highest
retained resolution.  Output: single [B, H/2^d, W/2^d, channels[0]] map.

TPU-first design choices:
- NHWC activations end-to-end (TPU conv native layout).
- Upsampling uses ConvTranspose(kernel=scale, stride=scale, VALID) which
  is mathematically identical to the reference's
  ``nn.ConvTranspose2d(kernel_size=scale, stride=scale)``.
- BatchNorm momentum 0.9 == torch momentum 0.1; eps 1e-5.
- All shapes static; the reference's ``pad_to_match`` is only exercised
  for odd spatial sizes, handled here with symmetric pad/crop computed at
  trace time.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class ConvBnRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=jnp.float32,
        )(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    """3x3 conv x2 with a 1x1 projected residual (dla.py:8-52)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=jnp.float32,
        )

        residual = nn.Conv(
            self.features, (1, 1), strides=(self.stride, self.stride),
            dtype=self.dtype,
        )(x)
        residual = bn()(residual)

        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, dtype=self.dtype,
        )(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(y)
        y = bn()(y)

        return nn.relu(y + residual)


class Root(nn.Module):
    """Concat children -> 1x1 conv -> BN -> relu (dla.py:58-76)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, children: List[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=jnp.float32,
        )(x)
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive HDA tree (dla.py:79-135)."""

    features: int
    height: int
    stride: int
    root_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        children: Optional[List[jnp.ndarray]] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if children is None:
            children = []

        root_channels = self.root_channels
        if root_channels is None:
            root_channels = 2 * self.features

        if self.height == 1:
            xl = ResidualBlock(self.features, self.stride, dtype=self.dtype)(
                x, train=train
            )
            xr = ResidualBlock(self.features, 1, dtype=self.dtype)(xl, train=train)
            return Root(self.features, dtype=self.dtype)(
                children + [xl, xr], train=train
            )

        xl = Tree(
            self.features,
            self.height - 1,
            self.stride,
            root_channels=None,
            dtype=self.dtype,
        )(x, train=train)
        return Tree(
            self.features,
            self.height - 1,
            1,
            root_channels=root_channels + self.features,
            dtype=self.dtype,
        )(xl, children=children + [xl], train=train)


class DLADown(nn.Module):
    """Stem + stride-2 blocks + tree stages (dla.py:138-192)."""

    heights: Sequence[int]
    channels: Sequence[int]
    downsamples: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        x = ConvBnRelu(self.channels[0], kernel=7, dtype=self.dtype)(
            img, train=train
        )

        for _ in range(self.downsamples):
            x = ResidualBlock(self.channels[0], stride=2, dtype=self.dtype)(
                x, train=train
            )

        outputs = [x]
        for i, height in enumerate(self.heights):
            x = Tree(self.channels[i + 1], height, stride=2, dtype=self.dtype)(
                x, train=train
            )
            outputs.append(x)
        return outputs


def pad_to_match(feature: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """Symmetrically pad/crop NHWC spatial dims to a target size
    (dla.py:195-209 intent; shapes are static so this resolves at trace)."""
    h, w = feature.shape[1], feature.shape[2]
    th, tw = target_hw
    if (h, w) == (th, tw):
        return feature
    pad_top = max(0, (th - h) // 2)
    pad_bottom = max(0, th - h - pad_top)
    pad_left = max(0, (tw - w) // 2)
    pad_right = max(0, tw - w - pad_left)
    feature = jnp.pad(
        feature,
        ((0, 0), (pad_top, pad_bottom), (pad_left, pad_right), (0, 0)),
    )
    return feature[:, :th, :tw, :]


class IDAUp(nn.Module):
    """Iterative deep aggregation, deepest-first (dla.py:212-284):
    new[i] = out_conv(features[i] + up(project(new[i+1])))."""

    feature_channels: Sequence[int]
    scales: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: List[jnp.ndarray], train: bool = False
    ) -> List[jnp.ndarray]:
        assert len(features) == len(self.feature_channels)
        assert len(self.scales) == len(features) - 1

        new_features = []
        new_feature = features[-1]
        for i in reversed(range(len(features) - 1)):
            projected = ConvBnRelu(self.feature_channels[i], dtype=self.dtype)(
                new_feature, train=train
            )
            upsampled = nn.ConvTranspose(
                self.feature_channels[i],
                (self.scales[i], self.scales[i]),
                strides=(self.scales[i], self.scales[i]),
                padding="VALID",
                dtype=self.dtype,
            )(projected)
            upsampled = pad_to_match(upsampled, features[i].shape[1:3])
            new_feature = ConvBnRelu(self.feature_channels[i], dtype=self.dtype)(
                features[i] + upsampled, train=train
            )
            new_features.append(new_feature)

        return list(reversed(new_features))


class IDAUpReverse(nn.Module):
    """Shallow-first aggregation into channels[0] (dla.py:287-357):
    new = out_conv(new + up_i(project_i(features[i+1])))."""

    feature_channels: Sequence[int]
    scales: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: List[jnp.ndarray], train: bool = False
    ) -> List[jnp.ndarray]:
        assert len(features) == len(self.feature_channels)

        if len(features) == 1:
            # Nothing to aggregate (2-level DLA); identity.  The reference
            # would crash here (dla.py:357 returns an empty list its caller
            # indexes), so this is the evident intent.
            return [features[0]]

        new_features = []
        new_feature = features[0]
        for i in range(len(features) - 1):
            projected = ConvBnRelu(self.feature_channels[0], dtype=self.dtype)(
                features[i + 1], train=train
            )
            upsampled = nn.ConvTranspose(
                self.feature_channels[0],
                (self.scales[i], self.scales[i]),
                strides=(self.scales[i], self.scales[i]),
                padding="VALID",
                dtype=self.dtype,
            )(projected)
            upsampled = pad_to_match(upsampled, new_feature.shape[1:3])
            new_feature = ConvBnRelu(self.feature_channels[0], dtype=self.dtype)(
                new_feature + upsampled, train=train
            )
            new_features.append(new_feature)

        return new_features


class MultiIDAUp(nn.Module):
    """Stack of IDAUp stages, each consuming one more level (dla.py:360-390)."""

    feature_channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: List[jnp.ndarray], train: bool = False
    ) -> List[jnp.ndarray]:
        n = len(self.feature_channels)
        assert len(features) == n

        out = []
        for i in range(n - 1):
            keep = n - i
            stage = IDAUp(
                feature_channels=self.feature_channels[:keep],
                scales=[2] * (keep - 1),
                dtype=self.dtype,
            )
            features = stage(features, train=train)
            out.append(features[-1])

        assert len(features) == 1
        return list(reversed(out))


class DLABackbone(nn.Module):
    """Full DLA encoder-aggregator (dla.py:393-416).

    Output: [B, H/2^downsamples, W/2^downsamples, channels[0]].
    """

    heights: Sequence[int]
    channels: Sequence[int]
    downsamples: int
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.channels[0]

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        features = DLADown(
            self.heights, self.channels, self.downsamples, dtype=self.dtype
        )(img, train=train)
        features = MultiIDAUp(self.channels, dtype=self.dtype)(features, train=train)
        n = len(self.channels) - 1
        features = IDAUpReverse(
            feature_channels=self.channels[:n],
            scales=[2**i for i in range(1, n)],
            dtype=self.dtype,
        )(features, train=train)
        return features[-1]
