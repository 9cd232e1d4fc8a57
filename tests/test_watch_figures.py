"""wandb.watch-equivalent gradient statistics + per-val-epoch figure
logging (VERDICT r1 item 8; reference: yolact/scripts/train.py:480,
centernet/scripts/train.py:93-101)."""

import json
import pathlib

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.train import TrainState, adam_with_clip
from tauv_vision_tpu.train.metrics import JsonlWriter
from tauv_vision_tpu.train.trainer import Trainer, TrainerConfig
from tauv_vision_tpu.train.watch import watch_metrics


def test_watch_metrics_structure():
    params = {"layer_a": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)},
              "layer_b": {"kernel": 2.0 * jnp.ones((4,))}}
    grads = jax.tree_util.tree_map(lambda p: 0.5 * jnp.ones_like(p), params)
    stats = watch_metrics(params, grads)

    assert "watch/layer_a/kernel/param_norm" in stats
    assert "watch/layer_a/kernel/grad_norm" in stats
    assert "watch/layer_b/kernel/grad_absmax" in stats
    np.testing.assert_allclose(
        float(stats["watch/layer_a/kernel/param_norm"]), 3.0
    )
    np.testing.assert_allclose(
        float(stats["watch/layer_b/kernel/grad_absmax"]), 0.5
    )
    n_leaves = 3
    n_elements = 9 + 3 + 4
    np.testing.assert_allclose(
        float(stats["watch/global_grad_norm"]),
        np.sqrt(n_elements * 0.25), rtol=1e-6,
    )
    # jit-compatible: all values are scalars
    assert all(jnp.asarray(v).shape == () for v in stats.values())
    assert len(stats) == 3 * n_leaves + 1


def _tiny_state():
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(1)(x)

    model = Tiny()
    x = jnp.zeros((2, 3))
    variables = model.init(jax.random.key(0), x)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], batch_stats=None,
        tx=adam_with_clip(1e-2, 1.0),
    )
    return model, state, x


def test_trainer_watch_and_figures(tmp_path):
    """Trainer logs watch stats every watch_every steps and figures on
    validation batch 0, through the JSONL writer."""
    model, state, x = _tiny_state()
    y = jnp.ones((2, 1))

    @jax.jit
    def train_step(state, img, truth):
        def loss_fn(params):
            out = model.apply({"params": params}, img)
            return ((out - truth) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        stats = watch_metrics(state.params, grads)
        state = state.apply_gradients(grads=grads)

        import flax.struct

        @flax.struct.dataclass
        class L:
            total: jnp.ndarray

        return state, L(total=loss), stats

    @jax.jit
    def eval_step(state, img, truth):
        import flax.struct

        @flax.struct.dataclass
        class L:
            total: jnp.ndarray

        out = model.apply({"params": state.params}, img)
        return L(total=((out - truth) ** 2).mean())

    calls = []

    def figure_fn(state, img, truth):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        plt.plot([0, 1], [0, 1])
        calls.append(1)
        return {"val/test_figure": fig}

    writer = JsonlWriter(tmp_path / "metrics.jsonl")
    trainer = Trainer(
        train_step, eval_step, state,
        TrainerConfig(n_epochs=2, epoch_n_batches=3, watch_every=2,
                      weight_save_interval=0, keep_best=False),
        writer=writer, figure_fn=figure_fn,
    )
    batches = [(x, y)] * 3
    trainer.fit(lambda: iter(batches), lambda: iter(batches[:1]))
    writer.close()

    records = [
        json.loads(line)
        for line in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    watch_records = [r for r in records if "watch/global_grad_norm" in r]
    assert watch_records, "watch stats never logged"
    assert any("watch/Dense_0/kernel/grad_norm" in r for r in watch_records)

    figure_records = [r for r in records if r.get("figure")]
    assert len(figure_records) == 2  # one per epoch
    assert len(calls) == 2
    for r in figure_records:
        assert pathlib.Path(r["path"]).exists()


def test_yolact_figure_fn(tmp_path):
    """The real YOLACT figure hook produces prototype/detection figures."""
    from tauv_vision_tpu.configs import YolactModelConfig
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.train.figures import make_yolact_figure_fn
    from tauv_vision_tpu.train.yolact_task import YolactTruth

    cfg = YolactModelConfig(
        in_w=96, in_h=64, feature_depth=16, n_classes=2, n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0, n_box_layers=0,
        n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5, iou_neg_threshold=0.4,
        negative_example_ratio=3,
    )
    model = Yolact(cfg)
    img = jnp.zeros((1, cfg.in_h, cfg.in_w, 3))
    variables = model.init(jax.random.key(0), img)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(1e-3, 1.0),
    )
    truth = YolactTruth(
        valid=jnp.array([[True]]),
        classification=jnp.array([[1]], jnp.int32),
        box=jnp.array([[[0.5, 0.5, 0.4, 0.4]]]),
        seg_map=jnp.zeros((1, cfg.in_h, cfg.in_w), jnp.int32),
        img_valid=jnp.ones((1, cfg.in_h, cfg.in_w), bool),
    )
    figure_fn = make_yolact_figure_fn(model, cfg, confidence_threshold=0.0)
    figures = figure_fn(state, img, truth)
    assert "val/prototypes" in figures
    assert "val/detections" in figures
    for fig in figures.values():
        fig.savefig(tmp_path / "out.png")  # renders without error
    import matplotlib.pyplot as plt

    plt.close("all")


@pytest.mark.slow
def test_centernet_train_step_watch():
    """make_centernet_train_step(watch=True) returns (state, losses,
    stats) with per-layer grad stats (the factory path the train
    scripts' --watch-every uses)."""
    from math import pi

    from tauv_vision_tpu.configs import (
        AngleConfig,
        CenternetModelConfig,
        CenternetTrainConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.data.synthetic import (
        SquareDatasetConfig,
        generate_square_batch,
    )
    from tauv_vision_tpu.models.centernet import Centernet
    from tauv_vision_tpu.train import make_centernet_train_step

    object_config = ObjectConfigSet(configs=(
        ObjectConfig(
            id="square", yaw=AngleConfig(train=False, modulo=2 * pi),
            pitch=AngleConfig(train=False, modulo=2 * pi),
            roll=AngleConfig(train=False, modulo=2 * pi),
            train_depth=False, train_keypoints=False, keypoints=None,
        ),
    ))
    model_config = CenternetModelConfig(
        in_h=32, in_w=32, backbone_heights=(1,), backbone_channels=(8, 8),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    train_config = CenternetTrainConfig(
        lr=1e-3, batch_size=2, n_batches=0, n_epochs=1,
        heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
        heatmap_sigma_factor=0.1, keypoint_heatmap_sigma=1.0,
        keypoint_affinity_sigma=2.0, loss_lambda_keypoint_heatmap=1.0,
        loss_lambda_keypoint_affinity=1.0, loss_lambda_size=0.1,
        loss_lambda_offset=1.0, loss_lambda_angle=1.0,
        loss_lambda_depth=1.0, max_objects=2, max_keypoints=4,
    )
    model = Centernet(
        object_config=object_config, backbone_heights=(1,),
        backbone_channels=(8, 8), downsamples=2,
    )
    img0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), img0, train=False)
    from tauv_vision_tpu.train import adam_with_clip

    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(1e-3, 1.0),
    )
    step = make_centernet_train_step(
        model, model_config, train_config, object_config, watch=True
    )
    rng = np.random.default_rng(0)
    img, truth = generate_square_batch(
        rng, 2,
        SquareDatasetConfig(in_h=32, in_w=32, max_objects=2, min_side=6,
                            max_side=12),
    )
    truth = jax.tree_util.tree_map(jnp.asarray, truth)
    new_state, losses, stats = step(state, jnp.asarray(img), truth)
    assert np.isfinite(float(losses.total))
    assert "watch/global_grad_norm" in stats
    grad_keys = [k for k in stats if k.endswith("/grad_norm")]
    assert len(grad_keys) > 5
    assert all(np.isfinite(float(v)) for v in stats.values())
