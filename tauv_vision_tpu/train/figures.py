"""Per-validation-epoch figure generation — the reference's W&B figure
logging as trainer-pluggable hooks.

Reference behavior being matched:
- CenterNet: predicted per-class heatmap grid for validation batch 0
  (``centernet/scripts/train.py:93-101``), plus the rendered truth
  heatmap for side-by-side reading.
- YOLACT: prototype grid, decoded-detection boxes vs truth, and
  assembled masks for validation batch 0
  (``yolact/scripts/train.py:265-311`` ``plot_validation_batch``).
- YOLO-Pose: assembled belief maps for the highest-confidence anchor
  (``yolo_pose/scripts/train.py:227-255``).

Each factory returns ``figure_fn(state, img, truth) -> {tag: Figure}``
consumed by :class:`~tauv_vision_tpu.train.trainer.Trainer` via
``MetricWriter.log_figure``.  All plotting is host-side numpy.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.ops.heatmap import generate_heatmap
from tauv_vision_tpu.utils import plot


def _apply(model, state, img):
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    return model.apply(variables, img, train=False)


def _denormalize(img0: np.ndarray, mean, stddev) -> np.ndarray:
    return np.clip(
        np.asarray(img0, np.float32) * np.asarray(stddev) + np.asarray(mean),
        0.0, 1.0,
    )


def make_centernet_figure_fn(model, model_config, train_config,
                             object_config):
    def figure_fn(state, img, truth) -> Dict[str, object]:
        prediction = _apply(model, state, img)
        pred_hm = np.asarray(
            jax.nn.sigmoid(prediction.heatmap[0].astype(jnp.float32))
        ).transpose(2, 0, 1)  # [C, h, w]
        truth_hm = np.asarray(
            generate_heatmap(
                truth.center[:1], truth.label[:1], truth.valid[:1],
                n_labels=object_config.n_labels,
                in_h=model_config.in_h, in_w=model_config.in_w,
                downsample_ratio=model_config.downsample_ratio,
                sigma=train_config.keypoint_heatmap_sigma,
            )[0]
        )
        figures = {
            "val/heatmap": plot.plot_heatmap(pred_hm),
            "val/heatmap_truth": plot.plot_heatmap(truth_hm),
        }
        if prediction.keypoint_heatmap is not None:
            kp = np.asarray(
                jax.nn.sigmoid(
                    prediction.keypoint_heatmap[0].astype(jnp.float32)
                )
            ).transpose(2, 0, 1)
            figures["val/keypoint_heatmap"] = plot.plot_heatmap(kp)
        return figures

    return figure_fn


def make_yolact_figure_fn(model, model_config, top_k: int = 8,
                          confidence_threshold: float = 0.3):
    from tauv_vision_tpu.serving.yolact_decode import decode_yolact

    def figure_fn(state, img, truth) -> Dict[str, object]:
        prediction = _apply(model, state, img)
        detections = decode_yolact(
            prediction, model_config, top_k, 0.5, confidence_threshold
        )
        proto = np.asarray(
            prediction.mask_prototype[0].astype(jnp.float32)
        ).transpose(2, 0, 1)  # [P, h, w]

        img0 = _denormalize(
            img[0], model_config.img_mean, model_config.img_stddev
        )
        valid = np.asarray(detections.valid[0])
        figures = {
            "val/prototypes": plot.plot_prototype(proto),
            "val/detections": plot.plot_detection(
                img0,
                np.asarray(detections.label[0])[valid],
                np.asarray(detections.box[0])[valid],
                truth_valid=np.asarray(truth.valid[0]),
                truth_classification=np.asarray(truth.classification[0]),
                truth_box=np.asarray(truth.box[0]),
            ),
        }
        if valid.any():
            figures["val/masks"] = plot.plot_mask(
                img0, np.asarray(detections.mask[0])[valid]
            )
        return figures

    return figure_fn


def make_yolo_pose_figure_fn(model, model_config):
    def figure_fn(state, img, truth) -> Dict[str, object]:
        prediction = _apply(model, state, img)
        confidence = jax.nn.softmax(
            prediction.classification[0].astype(jnp.float32), axis=-1
        )
        best = jnp.argmax(jnp.max(confidence[:, 1:], axis=-1))

        proto = prediction.belief_prototypes[-1][0].astype(jnp.float32)
        coeff = prediction.belief_coeff[0, best].astype(jnp.float32)  # [K, Pb]
        belief = jax.nn.sigmoid(
            jnp.einsum("hwp,kp->khw", proto, coeff)
        )
        figures = {
            "val/belief": plot.plot_heatmap(np.asarray(belief)),
            "val/mask_prototypes": plot.plot_prototype(
                np.asarray(
                    prediction.mask_prototype[0].astype(jnp.float32)
                ).transpose(2, 0, 1)
            ),
        }
        return figures

    return figure_fn
