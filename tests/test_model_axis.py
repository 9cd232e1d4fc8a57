"""2-D (data, model) mesh equivalence tests.

SURVEY.md §2.9 reserves a model axis for activation sharding as inputs
grow; these tests make that axis real: the SAME train step runs on a
(data=4, model=2) mesh — image width split over the model axis, GSPMD
inserting conv halo exchanges — and must produce the same losses and
updated parameters as the unsharded step.  Also pins DP gradient
equivalence: an 8-way data-parallel step equals the single-device step.
"""

from math import pi

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.configs import YolactModelConfig, YolactTrainConfig
from tauv_vision_tpu.data.synthetic import (
    SquareDatasetConfig,
    generate_square_batch,
)
from tauv_vision_tpu.models.yolact import Yolact
from tauv_vision_tpu.parallel import (
    create_mesh,
    has_model_axis,
    replicate,
    shard_batch,
    spatial_sharding,
)
import optax

from tauv_vision_tpu.train import (
    TrainState,
    make_centernet_train_step,
    make_yolact_train_step,
)

from test_integration_train import (
    IN_H,
    IN_W,
    _centernet_setup,
    _make_yolact_truth,
)


def _centernet_state(model, train_config, img):
    variables = model.init(jax.random.key(0), img[:1], train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=optax.sgd(1.0),
    )


def _assert_tree_l2_close(a, b, rel, what):
    """Per-leaf relative-L2 comparison: elementwise max-abs is ill-posed
    for deep-net gradients, where reduction-order noise flips individual
    relu gates (O(1) change on single elements, negligible in norm)."""
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        la, lb = np.asarray(la, np.float64), np.asarray(lb, np.float64)
        err = np.linalg.norm(la - lb) / (np.linalg.norm(lb) + 1e-12)
        assert err < rel, f"{what}: rel-L2 {err:.3e} on shape {la.shape}"


def _assert_tree_close(a, b, atol, what):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=atol, rtol=atol,
            err_msg=what,
        )


@pytest.mark.slow
def test_centernet_2d_mesh_train_step_equivalence():
    """(data=4, model=2): width-sharded activations through the DLA
    backbone -> identical losses and updated params vs the unsharded
    step."""
    model, model_config, train_config, object_config = _centernet_setup(
        train_yaw=False
    )

    rng = np.random.default_rng(3)
    img_np, truth_np = generate_square_batch(
        rng, 8, SquareDatasetConfig(in_h=IN_H, in_w=IN_W, max_objects=2)
    )
    img = jnp.asarray(img_np)
    truth = jax.tree_util.tree_map(jnp.asarray, truth_np)

    # Unsharded baseline.
    state0 = _centernet_state(model, train_config, img)
    step = make_centernet_train_step(
        model, model_config, train_config, object_config
    )
    base_state, base_losses = step(state0, img, truth)

    # (4, 2) mesh: batch over data, width over model.
    mesh = create_mesh(n_data=4, n_model=2)
    assert has_model_axis(mesh)
    state1 = replicate(_centernet_state(model, train_config, img), mesh)
    img_sharded = jax.device_put(img, spatial_sharding(mesh))
    truth_sharded = shard_batch(truth, mesh)
    step2d = make_centernet_train_step(
        model, model_config, train_config, object_config, mesh=mesh
    )
    mesh_state, mesh_losses = step2d(state1, img_sharded, truth_sharded)

    np.testing.assert_allclose(
        float(mesh_losses.total), float(base_losses.total), atol=1e-5,
        rtol=1e-5,
    )
    _assert_tree_close(mesh_state.params, base_state.params, 2e-5, "params")
    _assert_tree_close(
        mesh_state.batch_stats, base_state.batch_stats, 2e-5, "batch_stats"
    )


@pytest.mark.slow
def test_yolact_2d_mesh_train_step_equivalence():
    """Protonet/FPN activations width-sharded over the model axis."""
    cfg = YolactModelConfig(
        in_w=IN_W, in_h=IN_H, feature_depth=16, n_classes=2,
        n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(12, 24, 48, 96, 192), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.4,
        # Saturate OHEM (ratio >> n_anchors/n_pos selects every negative):
        # at a random init the rank-k selection boundary sits between
        # near-tied background confidences, so reduction-order noise flips
        # WHICH negatives train and the gradients differ by O(1) even
        # though the loss matches to 1e-6.  Selection stability is what
        # makes a sharded-vs-unsharded gradient comparison meaningful.
        iou_neg_threshold=0.3, negative_example_ratio=1000,
    )
    tcfg = YolactTrainConfig(
        lr=1e-3, momentum=0.9, weight_decay=0.0, grad_max_norm=1.0,
        n_epochs=1, batch_size=8, epoch_n_batches=1,
        max_objects=2, max_positive_anchors=None,  # exact: no top-k boundary
    )

    rng = np.random.default_rng(4)
    img, truth = _make_yolact_truth(rng, 8, 2, IN_H, IN_W)

    model = Yolact(cfg)

    def fresh_state():
        # Re-init per state: the train step donates its state argument,
        # which would delete buffers shared with a cached init.
        variables = model.init(jax.random.key(0), img[:1], train=False)
        return TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=optax.sgd(1.0),
        )

    step = make_yolact_train_step(model, cfg, tcfg)
    base_state, base_losses = step(fresh_state(), img, truth)

    mesh = create_mesh(n_data=4, n_model=2)
    state = replicate(fresh_state(), mesh)
    img_sharded = jax.device_put(img, spatial_sharding(mesh))
    truth_sharded = shard_batch(truth, mesh)
    step2d = make_yolact_train_step(model, cfg, tcfg, mesh=mesh)
    mesh_state, mesh_losses = step2d(state, img_sharded, truth_sharded)

    np.testing.assert_allclose(
        float(mesh_losses.total), float(base_losses.total), atol=1e-5,
        rtol=1e-5,
    )
    # Per-leaf relative-L2: a structural sharding bug (missing halo /
    # psum / the degenerate width-1 shard caught by small_map_guard)
    # corrupts whole leaves at rel-L2 ~ O(1); relu-flip noise stays
    # under ~1e-3.
    _assert_tree_l2_close(mesh_state.params, base_state.params, 1e-2, "params")


@pytest.mark.slow
def test_centernet_dp_grad_equivalence_1_vs_8():
    """One DP step over the full 8-way mesh must equal the single-device
    step on the same batch (the all-reduced mean gradient is the same
    mean)."""
    model, model_config, train_config, object_config = _centernet_setup(
        train_yaw=False
    )

    rng = np.random.default_rng(5)
    img_np, truth_np = generate_square_batch(
        rng, 8, SquareDatasetConfig(in_h=IN_H, in_w=IN_W, max_objects=2)
    )
    img = jnp.asarray(img_np)
    truth = jax.tree_util.tree_map(jnp.asarray, truth_np)

    state0 = _centernet_state(model, train_config, img)
    step = make_centernet_train_step(
        model, model_config, train_config, object_config
    )
    base_state, base_losses = step(state0, img, truth)

    mesh = create_mesh(n_data=8)
    state1 = replicate(_centernet_state(model, train_config, img), mesh)
    step_dp = make_centernet_train_step(
        model, model_config, train_config, object_config, mesh=mesh
    )
    dp_state, dp_losses = step_dp(
        state1, shard_batch(img, mesh), shard_batch(truth, mesh)
    )

    np.testing.assert_allclose(
        float(dp_losses.total), float(base_losses.total), atol=1e-5, rtol=1e-5
    )
    # Same f32 reduction-order tolerance as above.
    _assert_tree_close(dp_state.params, base_state.params, 1e-3, "params")
