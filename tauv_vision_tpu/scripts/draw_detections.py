"""CenterNet prediction-overlay renderer.

Parity target: ``centernet/scripts/draw_detections.py`` (and the two
``draw_detections_single*`` variants) — run the detector over dataset
images (or a directory of frames) and write box overlays.

Run:
  python -m tauv_vision_tpu.scripts.draw_detections \
      --images ~/frames --checkpoint ~/runs/cn/checkpoints \
      --config tauv_vision_tpu.configs.samples_torpedo --out ~/overlays
"""

from __future__ import annotations

import argparse
import importlib
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
from tauv_vision_tpu.serving.pipeline import make_centernet_pipeline
from tauv_vision_tpu.train import TrainState, adam_with_clip
from tauv_vision_tpu.train.checkpoint import CheckpointManager
from tauv_vision_tpu.utils.plot import plot_prediction_np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", required=True,
                        help="directory of frames OR a dataset root "
                             "(data/*.png is used when present)")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config",
                        default="tauv_vision_tpu.configs.samples_torpedo")
    parser.add_argument("--out", required=True)
    parser.add_argument("--n-detections", type=int, default=10)
    parser.add_argument("--score-threshold", type=float, default=0.5)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--limit", type=int, default=200)
    args = parser.parse_args(argv)

    config_module = importlib.import_module(args.config)
    model_config = config_module.model_config
    object_config = config_module.object_config
    class_names = [c.id for c in object_config.configs]

    model = CenterpointDLA34(object_config=object_config, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, model_config.in_h, model_config.in_w, 3))
    variables = jax.jit(lambda k: model.init(k, img0, train=False))(
        jax.random.key(0)
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=adam_with_clip(1e-4, 1.0),
    )
    state = CheckpointManager(
        pathlib.Path(args.checkpoint).expanduser()
    ).restore(state)
    inference_variables = {"params": state.params}
    if state.batch_stats is not None:
        inference_variables["batch_stats"] = state.batch_stats

    pipeline = make_centernet_pipeline(
        model, model_config, n_detections=args.n_detections,
        score_threshold=args.score_threshold,
    )

    images_dir = pathlib.Path(args.images).expanduser()
    if (images_dir / "data").is_dir():
        images_dir = images_dir / "data"
    out_dir = pathlib.Path(args.out).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)

    paths = sorted(
        p for p in images_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
        and not p.stem.endswith("_seg")
    )[: args.limit]

    for start in range(0, len(paths), args.batch_size):
        batch_paths = paths[start: start + args.batch_size]
        frames = np.stack(
            [np.asarray(Image.open(p).convert("RGB")) for p in batch_paths]
        )
        det = pipeline(inference_variables, jnp.asarray(frames))

        valid = np.asarray(det.valid)
        for i, path in enumerate(batch_paths):
            keep = valid[i]
            boxes = np.stack(
                [
                    np.asarray(det.y[i]), np.asarray(det.x[i]),
                    np.asarray(det.h[i]), np.asarray(det.w[i]),
                ],
                axis=-1,
            )
            overlay = plot_prediction_np(
                frames[i],
                np.asarray(det.label[i])[keep],
                np.asarray(det.score[i])[keep],
                boxes[keep],
                class_names=class_names,
            )
            Image.fromarray(overlay).save(out_dir / f"{path.stem}_det.png")
        print(f"{min(start + args.batch_size, len(paths))}/{len(paths)}",
              flush=True)


if __name__ == "__main__":
    main()
