"""YOLO-Pose: YOLACT x DOPE hybrid model.

Parity target: ``yolo_pose/model/model.py:20-68`` — YOLACT skeleton plus
a Pointnet belief/affinity prototype cascade on FPN level 1, and a
prediction head additionally emitting per-anchor belief/affinity
coefficients.  The reference subtree is stale (broken import paths,
mismatched backbone depths, empty inference.py); this is the rebuilt,
working version sharing the framework's ResNet-18 trunk / FPN / protonet.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig
from tauv_vision_tpu.models.fpn import FeaturePyramid
from tauv_vision_tpu.models.pointnet import Pointnet
from tauv_vision_tpu.models.prediction_head import ExtraStage
from tauv_vision_tpu.models.protonet import Protonet
from tauv_vision_tpu.models.resnet import ResnetFeatures
from tauv_vision_tpu.ops.anchors import get_all_anchors


@flax.struct.dataclass
class YoloPosePrediction:
    classification: jnp.ndarray    # [B, N, C+1]
    box_encoding: jnp.ndarray      # [B, N, 4]
    mask_coeff: jnp.ndarray        # [B, N, P]
    belief_coeff: jnp.ndarray      # [B, N, K, Pb]
    affinity_coeff: jnp.ndarray    # [B, N, 2K, Pa]
    anchor: jnp.ndarray            # [N, 4]
    mask_prototype: jnp.ndarray    # [B, h, w, P]
    belief_prototypes: Tuple[jnp.ndarray, ...]    # stages of [B, hb, wb, Pb]
    affinity_prototypes: Tuple[jnp.ndarray, ...]  # stages of [B, hb, wb, Pa]


class YoloPoseHead(nn.Module):
    """Prediction head emitting class/box/mask + belief/affinity coeffs
    (yolo_pose/model/prediction_head.py)."""

    config: YoloPoseModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fpn_output: jnp.ndarray, train: bool = False):
        cfg = self.config
        x = fpn_output
        for i in range(cfg.n_prediction_head_layers):
            x = ExtraStage(cfg.feature_depth, dtype=self.dtype,
                           name=f"shared_{i}")(x, train=train)

        a = cfg.n_anchors_per_cell
        b = fpn_output.shape[0]

        classification = nn.Conv(
            a * (cfg.n_classes + 1), (3, 3), padding=1, dtype=self.dtype,
            name="classification",
        )(x).reshape(b, -1, cfg.n_classes + 1)

        box_encoding = nn.Conv(
            a * 4, (3, 3), padding=1, dtype=self.dtype, name="box"
        )(x).reshape(b, -1, 4)

        mask_coeff = jnp.tanh(
            nn.Conv(
                a * cfg.n_prototype_masks, (3, 3), padding=1,
                dtype=self.dtype, name="mask",
            )(x).reshape(b, -1, cfg.n_prototype_masks)
        )

        belief_coeff = jnp.tanh(
            nn.Conv(
                a * cfg.belief_depth * cfg.prototype_belief_depth,
                (3, 3), padding=1, dtype=self.dtype, name="belief",
            )(x).reshape(b, -1, cfg.belief_depth, cfg.prototype_belief_depth)
        )

        affinity_coeff = jnp.tanh(
            nn.Conv(
                a * cfg.affinity_depth * cfg.prototype_affinity_depth,
                (3, 3), padding=1, dtype=self.dtype, name="affinity",
            )(x).reshape(b, -1, cfg.affinity_depth, cfg.prototype_affinity_depth)
        )

        return (
            classification.astype(jnp.float32),
            box_encoding.astype(jnp.float32),
            mask_coeff.astype(jnp.float32),
            belief_coeff.astype(jnp.float32),
            affinity_coeff.astype(jnp.float32),
        )


class YoloPose(nn.Module):
    config: YoloPoseModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> YoloPosePrediction:
        cfg = self.config

        backbone_outputs = ResnetFeatures(
            depth=cfg.backbone_depth, dtype=self.dtype, name="backbone"
        )(img, train=train)
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

        belief_prototypes, affinity_prototypes = Pointnet(
            pointnet_layers=cfg.pointnet_layers,
            pointnet_feature_depth=cfg.pointnet_feature_depth,
            prototype_belief_depth=cfg.prototype_belief_depth,
            prototype_affinity_depth=cfg.prototype_affinity_depth,
            dtype=self.dtype,
            name="pointnet",
        )(fpn_outputs[1])

        head = YoloPoseHead(cfg, dtype=self.dtype, name="prediction_head")

        outs = [head(f, train=train) for f in fpn_outputs]
        classification = jnp.concatenate([o[0] for o in outs], axis=1)
        box_encoding = jnp.concatenate([o[1] for o in outs], axis=1)
        mask_coeff = jnp.concatenate([o[2] for o in outs], axis=1)
        belief_coeff = jnp.concatenate([o[3] for o in outs], axis=1)
        affinity_coeff = jnp.concatenate([o[4] for o in outs], axis=1)

        anchor = jnp.asarray(
            get_all_anchors(
                cfg.in_h, cfg.in_w, cfg.n_fpn_levels,
                cfg.anchor_scales, cfg.anchor_aspect_ratios,
            )
        )

        return YoloPosePrediction(
            classification=classification,
            box_encoding=box_encoding,
            mask_coeff=mask_coeff,
            belief_coeff=belief_coeff,
            affinity_coeff=affinity_coeff,
            anchor=anchor,
            mask_prototype=mask_prototype,
            belief_prototypes=tuple(belief_prototypes),
            affinity_prototypes=tuple(affinity_prototypes),
        )
