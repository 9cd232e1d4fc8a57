"""CenterNet evaluation: precision/recall curves over a dataset split.

Parity targets: ``centernet/scripts/evaluate.py`` (box IoU matching) and
``centernet/scripts/evaluate_keypoints.py`` (center-distance matching);
both sweep 10 score thresholds and plot a PR curve.

Run:
  python -m tauv_vision_tpu.scripts.evaluate_centernet \
      --dataset-root ~/datasets/run1 --checkpoint ~/runs/cn/checkpoints \
      --config tauv_vision_tpu.configs.samples_torpedo --out pr.png
"""

from __future__ import annotations

import argparse
import importlib
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.data import augment
from tauv_vision_tpu.data.dataset_dir import Split
from tauv_vision_tpu.data.loader import BatchLoader
from tauv_vision_tpu.data.pose_dataset import PoseDataset, collate_pose_samples
from tauv_vision_tpu.eval import (
    average_precision,
    center_distance_match,
    detections_from_arrays,
    iou_match,
    plot_pr_curve,
    precision_recall_curve,
    truths_from_batch,
)
from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
from tauv_vision_tpu.serving.centernet_decode import decode
from tauv_vision_tpu.train import TrainState, adam_with_clip
from tauv_vision_tpu.train.checkpoint import CheckpointManager


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-root", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config",
                        default="tauv_vision_tpu.configs.samples_torpedo")
    parser.add_argument("--split", default="test", choices=["train", "val", "test"])
    parser.add_argument("--iou-threshold", type=float, default=0.5)
    parser.add_argument("--match", default="iou", choices=["iou", "center"])
    parser.add_argument("--center-threshold", type=float, default=0.05)
    parser.add_argument("--n-detections", type=int, default=100)
    parser.add_argument("--max-batches", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--out", default="pr_curve.png")
    args = parser.parse_args(argv)

    config_module = importlib.import_module(args.config)
    model_config = config_module.model_config
    train_config = config_module.train_config
    object_config = config_module.object_config

    model = CenterpointDLA34(object_config=object_config, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, model_config.in_h, model_config.in_w, 3))
    variables = jax.jit(lambda k: model.init(k, img0, train=False))(
        jax.random.key(0)
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(1e-4, 1.0),
    )
    state = CheckpointManager(pathlib.Path(args.checkpoint).expanduser()).restore(state)
    inference_variables = {"params": state.params}
    if state.batch_stats is not None:
        inference_variables["batch_stats"] = state.batch_stats

    @jax.jit
    def infer(img):
        prediction = model.apply(inference_variables, img, train=False)
        return decode(prediction, model_config, args.n_detections, 0.0)

    dataset = PoseDataset(
        pathlib.Path(args.dataset_root).expanduser(), Split(args.split),
        object_config.label_id_to_index, object_config,
        augment.Compose([augment.Resize(model_config.in_h, model_config.in_w)]),
    )
    loader = BatchLoader(
        dataset, args.batch_size,
        lambda s: collate_pose_samples(
            s, train_config.max_objects, train_config.max_keypoints
        ),
        shuffle=False, drop_last=False,
    )

    all_detections, all_truths = [], []
    for batch_i, (img, truth) in enumerate(loader):
        if batch_i >= args.max_batches:
            break
        det = infer(jnp.asarray(img))
        all_detections.extend(
            detections_from_arrays(
                np.asarray(det.valid), np.asarray(det.score),
                np.asarray(det.label), np.asarray(det.y), np.asarray(det.x),
                np.asarray(det.h), np.asarray(det.w),
            )
        )
        all_truths.extend(truths_from_batch(truth))
        print(f"evaluated batch {batch_i}", flush=True)

    match_fn = (
        iou_match(args.iou_threshold)
        if args.match == "iou"
        else center_distance_match(args.center_threshold)
    )
    thresholds, precision, recall = precision_recall_curve(
        all_detections, all_truths, match_fn
    )
    for t, p, r in zip(thresholds, precision, recall):
        print(f"threshold={t:.2f} precision={p:.4f} recall={r:.4f}")
    ap = average_precision(precision, recall)
    print(f"AP: {ap:.4f}")
    plot_pr_curve(precision, recall, args.out)
    print(f"PR curve saved to {args.out}")


if __name__ == "__main__":
    main()
