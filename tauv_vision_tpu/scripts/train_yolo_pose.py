"""YOLO-Pose training entry point (Falling Things single-object recipe).

Parity target: ``yolo_pose/scripts/train.py`` — FallingThings
single-variant training with LR warmup (:337-344), 960x480 input,
23-class config (:60-120).  The stale reference subtree is rebuilt on the
framework's working loaders/trainer.

Run:
  python -m tauv_vision_tpu.scripts.train_yolo_pose \
      --fat-root ~/falling_things/fat --results-dir ~/runs/yp
"""

from __future__ import annotations

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig
from tauv_vision_tpu.data.falling_things import (
    FallingThingsDataset,
    FallingThingsEnvironment,
    FallingThingsObject,
    FallingThingsVariant,
)
from tauv_vision_tpu.data.loader import BatchLoader
from tauv_vision_tpu.models.yolo_pose import YoloPose
from tauv_vision_tpu.train import TrainState, warmup_adam
from tauv_vision_tpu.train.checkpoint import CheckpointManager
from tauv_vision_tpu.train.figures import make_yolo_pose_figure_fn
from tauv_vision_tpu.train.metrics import JsonlWriter, MultiWriter, StdoutWriter
from tauv_vision_tpu.train.trainer import Trainer, TrainerConfig
from tauv_vision_tpu.train.watch import watch_metrics
from tauv_vision_tpu.train.yolo_pose_task import YoloPoseTruth, yolo_pose_loss

# Reference run config (yolo_pose/scripts/train.py:54-120), trimmed to
# the fields the rebuilt model needs.
model_config = YoloPoseModelConfig(
    in_w=960, in_h=480, feature_depth=64, n_classes=21, n_prototype_masks=16,
    n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
    pointnet_layers=((7, 5, 64), (7, 5, 64)),
    pointnet_feature_depth=64,
    prototype_belief_depth=16, prototype_affinity_depth=16,
    belief_depth=9, affinity_depth=18,
    n_prediction_head_layers=1, n_fpn_downsample_layers=2,
    belief_sigma=2.0, affinity_radius=6.0,
    anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
    box_variances=(0.1, 0.2),
    iou_pos_threshold=0.5, iou_neg_threshold=0.4, negative_example_ratio=3,
)

MAX_OBJECTS = 8


def collate_fat(samples, in_h, in_w):
    """FallingThingsSample list -> (img, YoloPoseTruth) padded batch."""
    b = len(samples)
    imgs = np.zeros((b, in_h, in_w, 3), np.float32)
    valid = np.zeros((b, MAX_OBJECTS), bool)
    classification = np.zeros((b, MAX_OBJECTS), np.int32)
    box = np.zeros((b, MAX_OBJECTS, 4), np.float32)
    box[..., 2:] = 1e-3
    seg = np.full((b, in_h, in_w), 255, np.int32)
    n_kp = 9
    keypoints = np.zeros((b, MAX_OBJECTS, n_kp, 2), np.float32)
    keypoint_valid = np.zeros((b, MAX_OBJECTS, n_kp), bool)
    centers = np.zeros((b, MAX_OBJECTS, 2), np.float32)

    import cv2

    for i, s in enumerate(samples):
        h0, w0 = s.img.shape[:2]
        imgs[i] = cv2.resize(s.img, (in_w, in_h)).astype(np.float32) / 255.0
        seg_resized = cv2.resize(
            s.seg_map.astype(np.float32), (in_w, in_h),
            interpolation=cv2.INTER_NEAREST,
        ).astype(np.int32)

        m = min(len(s.classifications), MAX_OBJECTS)
        valid[i, :m] = s.valid[:m]
        classification[i, :m] = s.classifications[:m]
        box[i, :m] = s.bounding_boxes[:m]
        # seg uses class ids; remap to object slots for the instance loss.
        remapped = np.full_like(seg_resized, 255)
        for slot in range(m):
            remapped[seg_resized == s.classifications[slot]] = slot
        seg[i] = remapped

        scale_y = in_h / h0
        scale_x = in_w / w0
        kp = s.projected_cuboids[:m]  # [m, 9, 2] (y, x) px at original res
        keypoints[i, :m, :, 0] = kp[..., 0] * scale_y
        keypoints[i, :m, :, 1] = kp[..., 1] * scale_x
        keypoint_valid[i, :m] = True
        centers[i, :m] = kp[:, 0] * np.asarray([scale_y, scale_x])

    truth = YoloPoseTruth(
        valid=valid, classification=classification, box=box, seg_map=seg,
        keypoints=keypoints, keypoint_valid=keypoint_valid, centers=centers,
    )
    return imgs, truth


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--fat-root", required=True)
    parser.add_argument("--results-dir", required=True)
    parser.add_argument("--object", default="MustardBottle")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--n-epochs", type=int, default=60)
    parser.add_argument("--epoch-n-batches", type=int, default=200)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--warmup-epochs", type=int, default=10)
    parser.add_argument("--overfit", action="store_true")
    parser.add_argument("--watch-every", type=int, default=0)
    args = parser.parse_args(argv)

    dataset = FallingThingsDataset(
        args.fat_root, FallingThingsVariant.SINGLE,
        list(FallingThingsEnvironment),
        objects=[FallingThingsObject[args.object]],
    )
    loader = BatchLoader(
        dataset, args.batch_size,
        lambda s: collate_fat(s, model_config.in_h, model_config.in_w),
        n_workers=4,
    )

    model = YoloPose(model_config, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, model_config.in_h, model_config.in_w, 3))
    variables = jax.jit(lambda k: model.init(k, img0, train=False))(
        jax.random.key(0)
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=warmup_adam(
            args.lr, args.warmup_epochs * args.epoch_n_batches, 1.0
        ),
    )

    def loss_fn(params, batch_stats, img, truth):
        vars = {"params": params}
        if batch_stats is not None:
            vars["batch_stats"] = batch_stats
        prediction, mutated = model.apply(
            vars, img, train=True, mutable=["batch_stats"]
        )
        losses = yolo_pose_loss(prediction, truth, model_config)
        return losses.total, (losses, mutated.get("batch_stats"))

    def make_step(watch: bool):
        @jax.jit
        def train_step(state, img, truth):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (losses, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, img, truth
            )
            stats = watch_metrics(state.params, grads) if watch else None
            state = state.apply_gradients(grads=grads)
            if new_stats is not None:
                state = state.replace(batch_stats=new_stats)
            if watch:
                return state, losses, stats
            return state, losses

        return train_step

    train_step = make_step(watch=False)
    watch_step = make_step(watch=True) if args.watch_every > 0 else None

    results_dir = pathlib.Path(args.results_dir).expanduser()
    trainer = Trainer(
        train_step, None, state,
        TrainerConfig(
            n_epochs=args.n_epochs, epoch_n_batches=args.epoch_n_batches,
            weight_save_interval=5, keep_best=False,
            overfit_single_batch=args.overfit,
            watch_every=args.watch_every,
        ),
        checkpoints=CheckpointManager(results_dir / "checkpoints"),
        writer=MultiWriter(
            StdoutWriter(), JsonlWriter(results_dir / "metrics.jsonl")
        ),
        figure_fn=make_yolo_pose_figure_fn(model, model_config),
        watch_step=watch_step,
    )
    trainer.fit(
        lambda: iter(loader),
        configs={"model_config": model_config},
    )


if __name__ == "__main__":
    main()
