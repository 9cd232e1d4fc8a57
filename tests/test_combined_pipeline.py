"""Fused dual-net serving graph (serving/pipeline.make_combined_pipeline).

The deployed system runs BOTH detector nodes on the same camera frames
(reference: centernet_node.py:62-63, yolact_node.py:74-84), so the
production serving graph — and the bench headline / --north-star
configuration — fuses both forwards + decodes into one jitted program
sharing the camera resize.  Contract: decoded outputs are IDENTICAL to
the separate per-model pipelines.
"""

from math import pi

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.configs import (
    AngleConfig,
    CenternetModelConfig,
    ObjectConfig,
    ObjectConfigSet,
    YolactModelConfig,
)
from tauv_vision_tpu.models.centernet import Centernet
from tauv_vision_tpu.models.yolact import Yolact
from tauv_vision_tpu.serving.pipeline import (
    make_centernet_pipeline,
    make_combined_pipeline,
    make_yolact_pipeline,
)


@pytest.mark.slow  # three full-graph CPU compiles (~2.7 min)
def test_fused_matches_separate_pipelines():
    oc = ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="x",
                yaw=AngleConfig(train=False, modulo=None),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=False, train_keypoints=False, keypoints=None,
            ),
        )
    )
    cn_cfg = CenternetModelConfig(
        in_h=64, in_w=64, backbone_heights=(1,), backbone_channels=(8, 8),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    cn_model = Centernet(
        object_config=oc, backbone_heights=cn_cfg.backbone_heights,
        backbone_channels=cn_cfg.backbone_channels,
        downsamples=cn_cfg.downsamples, dtype=jnp.float32,
    )
    cn_vars = cn_model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )

    yl_cfg = YolactModelConfig(
        in_w=64, in_h=64, feature_depth=16, n_classes=2,
        n_prototype_masks=4, n_masknet_layers_pre_upsample=1,
        n_masknet_layers_post_upsample=1, n_prediction_head_layers=1,
        n_classification_layers=0, n_box_layers=0, n_mask_layers=0,
        n_fpn_downsample_layers=2, anchor_scales=(12, 24, 48, 96, 192),
        anchor_aspect_ratios=(1.0,), box_variances=(0.1, 0.2),
        iou_pos_threshold=0.5, iou_neg_threshold=0.4,
        negative_example_ratio=3,
    )
    yl_model = Yolact(yl_cfg)
    yl_vars = yl_model.init(
        jax.random.key(1), jnp.zeros((1, 64, 64, 3)), train=False
    )

    rng = np.random.default_rng(7)
    # Non-square camera frames: the shared resize (80x96 -> 64x64) is
    # part of the contract.
    frames = jnp.asarray(
        rng.integers(0, 256, (3, 80, 96, 3), dtype=np.uint8)
    )

    kw = dict(dtype=jnp.float32)
    cn_sep = make_centernet_pipeline(
        cn_model, cn_cfg, n_detections=4, score_threshold=0.0, **kw
    )(cn_vars, frames)
    yl_sep = make_yolact_pipeline(
        yl_model, yl_cfg, top_k=5, iou_threshold=0.5,
        confidence_threshold=0.0, **kw
    )(yl_vars, frames)

    fused = make_combined_pipeline(
        lambda img: cn_model.apply(cn_vars, img, train=False),
        cn_cfg,
        lambda img: yl_model.apply(yl_vars, img, train=False),
        yl_cfg,
        n_detections=4, score_threshold=0.0, top_k=5,
        iou_threshold=0.5, confidence_threshold=0.0, **kw,
    )
    cn_f, yl_f = fused(frames)

    for a, b in ((cn_sep, cn_f), (yl_sep, yl_f)):
        for name, la, lb in zip(
            [type(a).__name__] * 99,
            jax.tree_util.tree_leaves(a),
            jax.tree_util.tree_leaves(b),
        ):
            np.testing.assert_allclose(
                np.asarray(la, np.float32), np.asarray(lb, np.float32),
                rtol=0, atol=1e-6, err_msg=name,
            )
