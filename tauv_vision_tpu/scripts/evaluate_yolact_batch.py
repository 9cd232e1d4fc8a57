"""YOLACT batch evaluation: directory of images -> overlay PNGs.

Parity target: ``yolact/scripts/evaluate_batch.py:55-146`` — load config
JSONs + checkpoint, forward each frame, NMS, assemble masks, write
annotated overlays (for stitching into a video).

Run:
  python -m tauv_vision_tpu.scripts.evaluate_yolact_batch \
      --images ~/frames --checkpoint ~/runs/yl/checkpoints --out ~/overlays
"""

from __future__ import annotations

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tauv_vision_tpu.configs import ClassConfigSet, YolactModelConfig
from tauv_vision_tpu.models.yolact import Yolact
from tauv_vision_tpu.serving.pipeline import make_yolact_pipeline
from tauv_vision_tpu.train import TrainState, adam_with_clip
from tauv_vision_tpu.train.checkpoint import CheckpointManager
from tauv_vision_tpu.utils.plot import plot_prediction_np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="checkpoint dir (with model_config.json etc.)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--top-k", type=int, default=20)
    parser.add_argument("--iou-threshold", type=float, default=0.5)
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--int8", action="store_true",
                        help="serve with int8 post-training quantization "
                             "(calibrates on the first batch)")
    args = parser.parse_args(argv)

    ckpt_dir = pathlib.Path(args.checkpoint).expanduser()
    manager = CheckpointManager(ckpt_dir)
    model_config = YolactModelConfig.from_dict(manager.load_config("model_config"))
    class_config = ClassConfigSet.load(ckpt_dir / "class_config.json")
    class_names = ["background"] + [
        class_config.get_by_index(i + 1).id
        for i in range(model_config.n_classes)
        if class_config.get_by_index(i + 1) is not None
    ]

    model = Yolact(model_config, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, model_config.in_h, model_config.in_w, 3))
    variables = jax.jit(lambda k: model.init(k, img0, train=False))(
        jax.random.key(0)
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=adam_with_clip(1e-4, 1.0),
    )
    state = manager.restore(state)
    inference_variables = {"params": state.params}
    if state.batch_stats is not None:
        inference_variables["batch_stats"] = state.batch_stats

    pipeline = make_yolact_pipeline(
        model, model_config, top_k=args.top_k,
        iou_threshold=args.iou_threshold,
        confidence_threshold=args.confidence_threshold,
    )

    images_dir = pathlib.Path(args.images).expanduser()
    out_dir = pathlib.Path(args.out).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)

    paths = sorted(
        p for p in images_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )

    if args.int8 and paths:
        from tauv_vision_tpu.serving.quantize import calibrate, quantized_call

        raw = make_yolact_pipeline(
            model, model_config, top_k=args.top_k,
            iou_threshold=args.iou_threshold,
            confidence_threshold=args.confidence_threshold, jit=False,
        )
        cal_frames = np.stack(
            [
                np.asarray(Image.open(p).convert("RGB"))
                for p in paths[: min(2, len(paths))]
            ]
        )
        scales = calibrate(
            lambda b: raw(inference_variables, b), [jnp.asarray(cal_frames)]
        )
        quantized = jax.jit(
            quantized_call(lambda b: raw(inference_variables, b), scales)
        )
        pipeline = lambda v, frames: quantized(frames)  # noqa: E731

    for start in range(0, len(paths), args.batch_size):
        batch_paths = paths[start: start + args.batch_size]
        frames = np.stack(
            [np.asarray(Image.open(p).convert("RGB")) for p in batch_paths]
        )
        det = pipeline(inference_variables, jnp.asarray(frames))

        valid = np.asarray(det.valid)
        labels = np.asarray(det.label)
        scores = np.asarray(det.score)
        boxes = np.asarray(det.box)
        masks = np.asarray(det.mask)

        for i, path in enumerate(batch_paths):
            keep = valid[i]
            h, w = frames[i].shape[:2]
            # Upsample masks to frame resolution for the overlay.
            full_masks = np.stack(
                [
                    np.asarray(
                        Image.fromarray(
                            (masks[i, j] * 255).astype(np.uint8)
                        ).resize((w, h))
                    ) > 127
                    for j in range(masks.shape[1])
                ]
            )
            overlay = plot_prediction_np(
                frames[i], labels[i][keep], scores[i][keep],
                boxes[i][keep], full_masks[keep], class_names=class_names,
            )
            Image.fromarray(overlay).save(out_dir / f"{path.stem}_overlay.png")
        print(f"{min(start + args.batch_size, len(paths))}/{len(paths)}",
              flush=True)


if __name__ == "__main__":
    main()
