"""CenterNet head module.

Parity target: ``centernet/model/centernet.py`` — backbone followed by N
parallel heads (3x3 conv -> LeakyReLU -> 1x1 conv), where the head set is
derived from the ``ObjectConfigSet`` flags in a fixed pop-order: class
heatmap, optional keypoint heatmap + affinity, size(2), offset(2),
optional yaw/pitch/roll bin(4)+offset(4), optional depth(1).

TPU-first design choices:
- All dense maps are NHWC ([B, out_h, out_w, C]); the reference's
  channel-first heatmaps are transposed at the decode boundary.
- ``Prediction`` is a flax.struct dataclass, so it is a pytree that flows
  through jit/vmap/grad; absent heads are None (pytree-pruned), mirroring
  the reference's Optional fields.
- The heatmap head's final bias initializes to -2.19 (sigmoid ~ 0.1), the
  CenterNet/CenterPoint focal-loss init the reference applies in its
  production backbone (centerpoint_dla.py:506,513); other heads use
  xavier-uniform kernels + zero bias, matching initialize_weights
  (centernet.py:103-111).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from tauv_vision_tpu.configs.centernet import ObjectConfigSet
from tauv_vision_tpu.models.dla import DLABackbone


@flax.struct.dataclass
class Prediction:
    heatmap: jnp.ndarray                       # [B, H, W, n_labels] logits
    keypoint_heatmap: Optional[jnp.ndarray]    # [B, H, W, n_keypoints] logits
    keypoint_affinity: Optional[jnp.ndarray]   # [B, H, W, n_keypoints, 2]

    size: jnp.ndarray                          # [B, H, W, 2]
    offset: jnp.ndarray                        # [B, H, W, 2]

    roll_bin: Optional[jnp.ndarray]            # [B, H, W, 4]
    roll_offset: Optional[jnp.ndarray]         # [B, H, W, 4]
    pitch_bin: Optional[jnp.ndarray]           # [B, H, W, 4]
    pitch_offset: Optional[jnp.ndarray]        # [B, H, W, 4]
    yaw_bin: Optional[jnp.ndarray]             # [B, H, W, 4]
    yaw_offset: Optional[jnp.ndarray]          # [B, H, W, 4]

    depth: Optional[jnp.ndarray]               # [B, H, W, 1]

    def heatmap_nchw(self) -> jnp.ndarray:
        return jnp.transpose(self.heatmap, (0, 3, 1, 2))

    def keypoint_heatmap_nchw(self) -> jnp.ndarray:
        return jnp.transpose(self.keypoint_heatmap, (0, 3, 1, 2))


class Head(nn.Module):
    """3x3 conv -> LeakyReLU -> 1x1 conv (centernet.py:44-57)."""

    hidden: int
    out_channels: int
    bias_init_value: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.hidden, (3, 3), padding=1,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(x)
        x = nn.leaky_relu(x)
        x = nn.Conv(
            self.out_channels, (1, 1),
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.constant(self.bias_init_value),
            dtype=self.dtype,
        )(x)
        return x.astype(jnp.float32)


class Centernet(nn.Module):
    """Backbone + per-quantity prediction heads."""

    object_config: ObjectConfigSet
    backbone_heights: tuple
    backbone_channels: tuple
    downsamples: int
    dtype: jnp.dtype = jnp.float32
    heatmap_bias_init: float = -2.19

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> Prediction:
        # img: [B, in_h, in_w, 3] normalized.
        features = DLABackbone(
            heights=self.backbone_heights,
            channels=self.backbone_channels,
            downsamples=self.downsamples,
            dtype=self.dtype,
        )(img, train=train)

        hidden = 2 * self.backbone_channels[0]
        oc = self.object_config

        def head(out_channels: int, name: str, bias: float = 0.0):
            return Head(
                hidden, out_channels, bias_init_value=bias,
                dtype=self.dtype, name=name,
            )(features)

        heatmap = head(oc.n_labels, "heatmap", bias=self.heatmap_bias_init)

        keypoint_heatmap = None
        keypoint_affinity = None
        if oc.train_keypoints:
            keypoint_heatmap = head(
                oc.n_keypoints, "keypoint_heatmap", bias=self.heatmap_bias_init
            )
            aff = head(2 * oc.n_keypoints, "keypoint_affinity")
            b, h, w, _ = aff.shape
            # Channel layout matches the reference reshape [B, K*2, H, W] ->
            # [B, K, 2, H, W] (centernet.py:75): kp-major, (y, x) minor.
            keypoint_affinity = aff.reshape(b, h, w, oc.n_keypoints, 2)

        size = head(2, "size")
        offset = head(2, "offset")

        yaw_bin = head(4, "yaw_bin") if oc.train_yaw else None
        yaw_offset = head(4, "yaw_offset") if oc.train_yaw else None
        pitch_bin = head(4, "pitch_bin") if oc.train_pitch else None
        pitch_offset = head(4, "pitch_offset") if oc.train_pitch else None
        roll_bin = head(4, "roll_bin") if oc.train_roll else None
        roll_offset = head(4, "roll_offset") if oc.train_roll else None

        depth = head(1, "depth") if oc.train_depth else None

        return Prediction(
            heatmap=heatmap,
            keypoint_heatmap=keypoint_heatmap,
            keypoint_affinity=keypoint_affinity,
            size=size,
            offset=offset,
            roll_bin=roll_bin,
            roll_offset=roll_offset,
            pitch_bin=pitch_bin,
            pitch_offset=pitch_offset,
            yaw_bin=yaw_bin,
            yaw_offset=yaw_offset,
            depth=depth,
        )
