"""CenterNet training entry point.

Parity target: ``centernet/scripts/train.py`` — multi-dataset concat,
CenterpointDLA34 model (optional warm start), Adam(1e-4) + grad clip 1.0,
per-batch loss logging, epoch checkpoints — restated with argparse over
the reference's hardcoded module constants and a config module/JSON
(--config) for the model/object definitions.

Run:
  python -m tauv_vision_tpu.scripts.train_centernet \
      --dataset-roots ~/datasets/a ~/datasets/b \
      --results-dir ~/runs/centernet \
      --config tauv_vision_tpu.configs.samples_torpedo
"""

from __future__ import annotations

import argparse
import importlib
import pathlib

import jax
import jax.numpy as jnp

from tauv_vision_tpu.data import augment
from tauv_vision_tpu.data.dataset_dir import Split
from tauv_vision_tpu.data.loader import BatchLoader, ConcatDataset
from tauv_vision_tpu.data.pose_dataset import PoseDataset, collate_pose_samples
from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
from tauv_vision_tpu.parallel import create_mesh, replicate
from tauv_vision_tpu.train import (
    TrainState,
    adam_with_clip,
    make_centernet_eval_step,
    make_centernet_train_step,
)
from tauv_vision_tpu.train.checkpoint import CheckpointManager
from tauv_vision_tpu.train.metrics import JsonlWriter, MultiWriter, StdoutWriter
from tauv_vision_tpu.train.trainer import Trainer, TrainerConfig


def build_train_transform(model_config, train_config):
    """The reference's albumentations train pipeline restated
    (centernet/scripts/train.py:144-167)."""
    return augment.Compose(
        [
            augment.ColorJitter(p=0.8),
            augment.GaussNoise(p=0.4),
            augment.Blur(p=0.3),
            augment.HorizontalFlip(p=0.5),
            augment.ShiftScaleRotate(p=0.5),
            augment.Resize(model_config.in_h, model_config.in_w),
        ],
        min_visibility=0.2,
    )


def build_val_transform(model_config):
    return augment.Compose([augment.Resize(model_config.in_h, model_config.in_w)])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-roots", nargs="+", required=True)
    parser.add_argument("--results-dir", required=True)
    parser.add_argument(
        "--config", default="tauv_vision_tpu.configs.samples_torpedo",
        help="python module exposing model_config/train_config/object_config",
    )
    parser.add_argument("--checkpoint", default=None, help="warm-start path")
    parser.add_argument("--overfit", action="store_true")
    parser.add_argument("--epoch-n-batches", type=int, default=None)
    parser.add_argument(
        "--watch-every", type=int, default=0,
        help="log per-layer param/grad stats every N steps (wandb.watch)",
    )
    parser.add_argument(
        "--no-figures", action="store_true",
        help="disable per-val-epoch heatmap figures",
    )
    args = parser.parse_args(argv)

    config_module = importlib.import_module(args.config)
    model_config = config_module.model_config
    train_config = config_module.train_config
    object_config = config_module.object_config
    # Config modules may pick the backbone family: "dla34" (production,
    # the node's deployment model) or "dla" (the custom backbone built
    # from backbone_heights/backbone_channels, reference dla.py).
    backbone = getattr(config_module, "backbone", "dla34")

    if backbone == "dla34":
        model = CenterpointDLA34(
            object_config=object_config, dtype=jnp.bfloat16
        )
    else:
        from tauv_vision_tpu.models.centernet import Centernet

        model = Centernet(
            object_config=object_config,
            backbone_heights=model_config.backbone_heights,
            backbone_channels=model_config.backbone_channels,
            downsamples=model_config.downsamples,
            dtype=jnp.bfloat16,
        )

    train_transform = build_train_transform(model_config, train_config)
    val_transform = build_val_transform(model_config)

    label_map = object_config.label_id_to_index
    train_datasets = [
        PoseDataset(pathlib.Path(root).expanduser(), Split.TRAIN, label_map,
                    object_config, train_transform)
        for root in args.dataset_roots
    ]
    val_datasets = [
        PoseDataset(pathlib.Path(root).expanduser(), Split.VAL, label_map,
                    object_config, val_transform)
        for root in args.dataset_roots
    ]

    def collate(samples):
        return collate_pose_samples(
            samples, train_config.max_objects, train_config.max_keypoints
        )

    train_loader = BatchLoader(
        ConcatDataset(train_datasets), train_config.batch_size, collate,
        n_workers=train_config.n_workers or 4,
    )
    val_loader = BatchLoader(
        ConcatDataset(val_datasets), train_config.batch_size, collate,
        shuffle=False, n_workers=train_config.n_workers or 4,
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

    train_step = make_centernet_train_step(
        model, model_config, train_config, object_config, mesh=mesh,
    )
    watch_step = None
    if args.watch_every > 0:
        watch_step = make_centernet_train_step(
            model, model_config, train_config, object_config, mesh=mesh,
            watch=True,
        )
    eval_step = make_centernet_eval_step(
        model, model_config, train_config, object_config, mesh=mesh
    )

    figure_fn = None
    if not args.no_figures:
        from tauv_vision_tpu.train.figures import make_centernet_figure_fn

        figure_fn = make_centernet_figure_fn(
            model, model_config, train_config, object_config
        )

    trainer = Trainer(
        train_step, eval_step, state,
        TrainerConfig(
            n_epochs=train_config.n_epochs,
            epoch_n_batches=args.epoch_n_batches or len(train_loader),
            weight_save_interval=train_config.weight_save_interval,
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
            "object_config": object_config,
        },
    )


if __name__ == "__main__":
    main()
