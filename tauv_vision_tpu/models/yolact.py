"""YOLACT model assembly.

Parity target: ``yolact/model/model.py:18-60`` — ResNet backbone -> FPN
(3 taps + extra levels) -> protonet on level 0 + one *shared* prediction
head applied to every FPN level; per-level outputs concatenated over the
anchor axis.

TPU-first differences:
- Anchors are a compile-time constant (see ops/anchors.py) rather than
  regenerated per forward pass; the model returns them for API parity.
- NHWC throughout; outputs in f32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from tauv_vision_tpu.configs.yolact import YolactModelConfig
from tauv_vision_tpu.models.fpn import FeaturePyramid
from tauv_vision_tpu.models.prediction_head import PredictionHead
from tauv_vision_tpu.models.protonet import Protonet
from tauv_vision_tpu.models.resnet import Resnet18Features
from tauv_vision_tpu.ops.anchors import get_all_anchors


@flax.struct.dataclass
class YolactPrediction:
    classification: jnp.ndarray   # [B, N, C+1] logits
    box_encoding: jnp.ndarray     # [B, N, 4]
    mask_coeff: jnp.ndarray       # [B, N, P] (tanh'd)
    anchor: jnp.ndarray           # [N, 4] (y, x, h, w)
    mask_prototype: jnp.ndarray   # [B, proto_h, proto_w, P]

    def as_tuple(self) -> Tuple[jnp.ndarray, ...]:
        """Reference 5-tuple order (model.py:60), anchor broadcast to
        [1, N, 4] and prototypes channel-first [B, P, h, w]."""
        return (
            self.classification,
            self.box_encoding,
            self.mask_coeff,
            self.anchor[None],
            jnp.moveaxis(self.mask_prototype, -1, 1),
        )


class Yolact(nn.Module):
    config: YolactModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> YolactPrediction:
        cfg = self.config

        backbone_outputs = Resnet18Features(dtype=self.dtype, name="backbone")(
            img, train=train
        )

        fpn_outputs = FeaturePyramid(
            feature_depth=cfg.feature_depth,
            n_downsample_layers=cfg.n_fpn_downsample_layers,
            dtype=self.dtype,
            name="fpn",
        )(backbone_outputs)

        mask_prototype = Protonet(
            feature_depth=cfg.feature_depth,
            n_prototype_masks=cfg.n_prototype_masks,
            n_layers_pre_upsample=cfg.n_masknet_layers_pre_upsample,
            n_layers_post_upsample=cfg.n_masknet_layers_post_upsample,
            dtype=self.dtype,
            name="protonet",
        )(fpn_outputs[0])

        head = PredictionHead(
            feature_depth=cfg.feature_depth,
            n_classes=cfg.n_classes,
            n_prototype_masks=cfg.n_prototype_masks,
            n_anchors=cfg.n_anchors_per_cell,
            n_prediction_head_layers=cfg.n_prediction_head_layers,
            n_classification_layers=cfg.n_classification_layers,
            n_box_layers=cfg.n_box_layers,
            n_mask_layers=cfg.n_mask_layers,
            dtype=self.dtype,
            name="prediction_head",
        )

        classifications = []
        box_encodings = []
        mask_coeffs = []
        for fpn_output in fpn_outputs:
            classification, box_encoding, mask_coeff = head(fpn_output, train=train)
            classifications.append(classification)
            box_encodings.append(box_encoding)
            mask_coeffs.append(mask_coeff)

        anchor = jnp.asarray(
            get_all_anchors(
                cfg.in_h,
                cfg.in_w,
                cfg.n_fpn_levels,
                cfg.anchor_scales,
                cfg.anchor_aspect_ratios,
            )
        )

        return YolactPrediction(
            classification=jnp.concatenate(classifications, axis=1),
            box_encoding=jnp.concatenate(box_encodings, axis=1),
            mask_coeff=jnp.concatenate(mask_coeffs, axis=1),
            anchor=anchor,
            mask_prototype=mask_prototype,
        )


def n_total_anchors(config: YolactModelConfig) -> int:
    return get_all_anchors(
        config.in_h,
        config.in_w,
        config.n_fpn_levels,
        config.anchor_scales,
        config.anchor_aspect_ratios,
    ).shape[0]
