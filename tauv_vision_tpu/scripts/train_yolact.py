"""YOLACT training entry point.

Parity target: ``yolact/scripts/train.py`` — 7-class RoboSub config,
config JSONs saved alongside checkpoints for the serving path, heavy
augmentation pipeline (channel shuffle, color jitter, noise, flips,
blur, SSR + perspective with 254-invalid fill), best-val checkpointing.

Run:
  python -m tauv_vision_tpu.scripts.train_yolact \
      --dataset-roots ~/datasets/a --results-dir ~/runs/yolact
"""

from __future__ import annotations

import argparse
import pathlib

import jax
import jax.numpy as jnp

from tauv_vision_tpu.configs import (
    ClassConfig,
    ClassConfigSet,
    YolactModelConfig,
    YolactTrainConfig,
)
from tauv_vision_tpu.data import augment
from tauv_vision_tpu.data.dataset_dir import Split
from tauv_vision_tpu.data.loader import BatchLoader, ConcatDataset
from tauv_vision_tpu.data.segmentation_dataset import (
    SegmentationDataset,
    collate_segmentation_samples,
)
from tauv_vision_tpu.models.yolact import Yolact
from tauv_vision_tpu.parallel import create_mesh, replicate
from tauv_vision_tpu.train import (
    TrainState,
    adam_with_clip,
    make_yolact_eval_step,
    make_yolact_train_step,
)
from tauv_vision_tpu.train.checkpoint import CheckpointManager
from tauv_vision_tpu.train.metrics import JsonlWriter, MultiWriter, StdoutWriter
from tauv_vision_tpu.train.trainer import Trainer, TrainerConfig

# Module-literal run config (yolact/scripts/train.py:28-120).
model_config = YolactModelConfig(
    in_w=640, in_h=360, feature_depth=256, n_classes=7, n_prototype_masks=8,
    n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
    n_prediction_head_layers=1, n_classification_layers=0, n_box_layers=0,
    n_mask_layers=0, n_fpn_downsample_layers=2,
    anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
    box_variances=(0.1, 0.2), iou_pos_threshold=0.4, iou_neg_threshold=0.3,
    negative_example_ratio=3,
)

train_config = YolactTrainConfig(
    lr=1e-3, momentum=0.9, weight_decay=0.0, grad_max_norm=1.0,
    n_epochs=200, batch_size=24, epoch_n_batches=100,
    weight_save_interval=1,
    channel_shuffle_p=0.2, color_jitter_p=0.8,
    color_jitter_brightness=0.4, color_jitter_contrast=0.4,
    color_jitter_saturation=0.4, color_jitter_hue=0.1,
    gaussian_noise_p=0.4, gaussian_noise_var_limit=(10.0, 50.0),
    horizontal_flip_p=0.5, vertical_flip_p=0.1,
    blur_limit=(3, 7), blur_p=0.3,
    ssr_p=0.5, ssr_shift_limit=(-0.1, 0.1), ssr_scale_limit=(-0.2, 0.2),
    ssr_rotate_limit=(-15, 15),
    perspective_p=0.3, perspective_scale_limit=(0.05, 0.1),
    min_visibility=0.3, n_workers=4,
)

class_config = ClassConfigSet(
    configs=tuple(
        ClassConfig(id, i + 1)
        for i, id in enumerate(
            ("sample_24_coral", "sample_24_nautilus", "torpedo_24",
             "torpedo_24_octagon", "buoy_24", "gate_24", "bin_24")
        )
    )
)


def build_train_transform(mc: YolactModelConfig, tc: YolactTrainConfig):
    """yolact/scripts/train.py:413-455 restated."""
    return augment.Compose(
        [
            augment.ChannelShuffle(p=tc.channel_shuffle_p),
            augment.ColorJitter(
                p=tc.color_jitter_p, brightness=tc.color_jitter_brightness,
                contrast=tc.color_jitter_contrast,
                saturation=tc.color_jitter_saturation, hue=tc.color_jitter_hue,
            ),
            augment.GaussNoise(p=tc.gaussian_noise_p,
                               var_limit=tc.gaussian_noise_var_limit),
            augment.HorizontalFlip(p=tc.horizontal_flip_p),
            augment.VerticalFlip(p=tc.vertical_flip_p),
            augment.Blur(p=tc.blur_p, blur_limit=tc.blur_limit),
            augment.ShiftScaleRotate(
                p=tc.ssr_p, shift_limit=tc.ssr_shift_limit,
                scale_limit=tc.ssr_scale_limit,
                rotate_limit=tc.ssr_rotate_limit,
            ),
            augment.Perspective(p=tc.perspective_p,
                                scale_limit=tc.perspective_scale_limit),
            augment.Resize(mc.in_h, mc.in_w),
        ],
        min_visibility=tc.min_visibility,
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-roots", nargs="+", required=True)
    parser.add_argument("--results-dir", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--overfit", action="store_true")
    parser.add_argument(
        "--watch-every", type=int, default=0,
        help="log per-layer param/grad stats every N steps (wandb.watch, "
             "reference yolact/scripts/train.py:480)",
    )
    parser.add_argument("--no-figures", action="store_true")
    args = parser.parse_args(argv)

    model = Yolact(model_config, dtype=jnp.bfloat16)

    class_map = {c.id: c.index for c in class_config.configs}
    train_transform = build_train_transform(model_config, train_config)
    val_transform = augment.Compose(
        [augment.Resize(model_config.in_h, model_config.in_w)]
    )

    train_datasets = [
        SegmentationDataset(pathlib.Path(r).expanduser(), Split.TRAIN,
                            class_map, train_transform)
        for r in args.dataset_roots
    ]
    val_datasets = [
        SegmentationDataset(pathlib.Path(r).expanduser(), Split.VAL,
                            class_map, val_transform)
        for r in args.dataset_roots
    ]

    def collate(samples):
        return collate_segmentation_samples(samples, train_config.max_objects)

    train_loader = BatchLoader(
        ConcatDataset(train_datasets), train_config.batch_size, collate,
        n_workers=train_config.n_workers,
    )
    val_loader = BatchLoader(
        ConcatDataset(val_datasets), train_config.batch_size, collate,
        shuffle=False, n_workers=train_config.n_workers,
    )

    mesh = create_mesh() if len(jax.devices()) > 1 else None

    img0 = jnp.zeros((1, model_config.in_h, model_config.in_w, 3))
    variables = model.init(jax.random.key(0), img0, train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(train_config.lr, train_config.grad_max_norm),
    )

    results_dir = pathlib.Path(args.results_dir).expanduser()
    checkpoints = CheckpointManager(results_dir / "checkpoints")
    if args.checkpoint:
        state = CheckpointManager(pathlib.Path(args.checkpoint)).restore(state)
    if mesh is not None:
        state = replicate(state, mesh)

    train_step = make_yolact_train_step(model, model_config, train_config,
                                        mesh=mesh)
    watch_step = None
    if args.watch_every > 0:
        watch_step = make_yolact_train_step(
            model, model_config, train_config, mesh=mesh, watch=True
        )
    eval_step = make_yolact_eval_step(model, model_config, train_config,
                                      mesh=mesh)

    figure_fn = None
    if not args.no_figures:
        from tauv_vision_tpu.train.figures import make_yolact_figure_fn

        figure_fn = make_yolact_figure_fn(model, model_config)

    trainer = Trainer(
        train_step, eval_step, state,
        TrainerConfig(
            n_epochs=train_config.n_epochs,
            epoch_n_batches=train_config.epoch_n_batches,
            weight_save_interval=train_config.weight_save_interval,
            keep_best=True,
            overfit_single_batch=args.overfit,
            watch_every=args.watch_every,
        ),
        checkpoints=checkpoints,
        writer=MultiWriter(
            StdoutWriter(), JsonlWriter(results_dir / "metrics.jsonl")
        ),
        mesh=mesh,
        figure_fn=figure_fn,
        watch_step=watch_step,
    )
    trainer.fit(
        lambda: iter(train_loader),
        lambda: iter(val_loader),
        configs={
            "model_config": model_config,
            "train_config": train_config,
            "class_config": class_config,
        },
    )


if __name__ == "__main__":
    main()
