"""YOLO-Pose model / target / loss tests (the rebuilt family — the
reference subtree is stale and unfinished)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig
from tauv_vision_tpu.models.yolo_pose import YoloPose
from tauv_vision_tpu.train.yolo_pose_task import (
    YoloPoseTruth,
    create_affinity,
    create_belief,
    yolo_pose_loss,
)

CFG = YoloPoseModelConfig(
    in_w=96, in_h=64, feature_depth=16, n_classes=2, n_prototype_masks=4,
    n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
    pointnet_layers=((5, 3, 16), (5, 3, 16)),
    pointnet_feature_depth=16,
    prototype_belief_depth=4, prototype_affinity_depth=4,
    belief_depth=3, affinity_depth=6,
    n_prediction_head_layers=1, n_fpn_downsample_layers=2,
    belief_sigma=2.0, affinity_radius=4.0,
    anchor_scales=(12, 24, 48, 96, 192), anchor_aspect_ratios=(1.0,),
    box_variances=(0.1, 0.2),
    iou_pos_threshold=0.4, iou_neg_threshold=0.3, negative_example_ratio=3,
)


def test_create_belief_and_affinity():
    points = jnp.asarray([[4.0, 6.0], [10.0, 3.0]])
    valid = jnp.asarray([True, False])
    belief = create_belief((16, 12), points, valid, sigma=1.5)
    assert belief.shape == (2, 16, 12)
    assert float(belief[0, 4, 6]) == pytest.approx(1.0)
    assert float(belief[1].max()) == 0.0  # invalid point renders nothing

    center = jnp.asarray([8.0, 6.0])
    aff = create_affinity((16, 12), points, valid, center, radius=3.0)
    assert aff.shape == (4, 16, 12)
    # At the keypoint, the field points toward the center: (8-4, 6-6)/4 = (1, 0).
    np.testing.assert_allclose(
        [float(aff[0, 4, 6]), float(aff[1, 4, 6])], [1.0, 0.0], atol=1e-6
    )
    # Outside the radius the field is zero.
    assert float(jnp.abs(aff[0, 15, 11])) == 0.0
    # Invalid keypoint channels are zero.
    assert float(jnp.abs(aff[2:]).max()) == 0.0


@pytest.mark.slow
def test_yolo_pose_forward_and_loss():
    model = YoloPose(CFG)
    img = jnp.zeros((2, CFG.in_h, CFG.in_w, 3))
    variables = model.init(jax.random.key(0), img, train=False)
    pred = model.apply(variables, img, train=False)

    n = pred.anchor.shape[0]
    assert pred.classification.shape == (2, n, 3)
    assert pred.belief_coeff.shape == (2, n, 3, 4)
    assert pred.affinity_coeff.shape == (2, n, 6, 4)
    assert len(pred.belief_prototypes) == 2
    # Pointnet runs on FPN level 1 (stride 16).
    assert pred.belief_prototypes[0].shape == (2, 4, 6, 4)

    m, k = 2, 3
    rng = np.random.default_rng(0)
    truth = YoloPoseTruth(
        valid=jnp.asarray([[True, False], [True, True]]),
        classification=jnp.asarray([[1, 0], [2, 1]], jnp.int32),
        box=jnp.asarray(
            [
                [[0.5, 0.5, 0.4, 0.4], [0.0, 0.0, 0.001, 0.001]],
                [[0.3, 0.3, 0.3, 0.3], [0.7, 0.7, 0.3, 0.3]],
            ]
        ),
        seg_map=jnp.zeros((2, CFG.in_h, CFG.in_w), jnp.int32)
        .at[:, 10:30, 20:50].set(0),
        keypoints=jnp.asarray(
            rng.uniform(0, 60, (2, m, k, 2)).astype(np.float32)
        ),
        keypoint_valid=jnp.ones((2, m, k), bool),
        centers=jnp.asarray(
            rng.uniform(10, 50, (2, m, 2)).astype(np.float32)
        ),
    )

    losses = jax.jit(
        lambda p, t: yolo_pose_loss(p, t, CFG, max_positive_anchors=8)
    )(pred, truth)
    for field in ("total", "classification", "box", "mask", "belief",
                  "affinity"):
        assert np.isfinite(float(getattr(losses, field))), field
