"""Dataset visual audit: replay samples with their labels rendered.

Parity target: ``yolact/scripts/check_data.py:54-76`` (and the
``draw_detections*`` family) — walk a dataset split, render each sample's
boxes/segmentation to PNGs for eyeballing.

Run:
  python -m tauv_vision_tpu.scripts.check_data \
      --dataset-root ~/datasets/run1 --out ~/audit --limit 50
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np
from PIL import Image

from tauv_vision_tpu.data.dataset_dir import Split, read_classes, read_ids, read_sample
from tauv_vision_tpu.utils.plot import plot_prediction_np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-root", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--split", default="train",
                        choices=["train", "val", "test"])
    parser.add_argument("--limit", type=int, default=50)
    args = parser.parse_args(argv)

    root = pathlib.Path(args.dataset_root).expanduser()
    out_dir = pathlib.Path(args.out).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)

    try:
        classes = read_classes(root)
        class_list = [
            c["id"] if isinstance(c, dict) else c for c in classes
        ]
    except FileNotFoundError:
        class_list = []
    class_index = {c: i for i, c in enumerate(class_list)}

    ids = read_ids(root, Split(args.split))[: args.limit]
    for id in ids:
        sample = read_sample(root / "data", id, load_seg=True)
        boxes, labels = [], []
        for obj in sample.objects:
            bb = obj["bbox"]
            boxes.append([bb["y"], bb["x"], bb["h"], bb["w"]])
            label = obj.get("label") or obj.get("class_id")
            labels.append(class_index.get(label, 0))

        masks = None
        if sample.seg is not None and boxes:
            masks = np.stack(
                [sample.seg == i for i in range(len(boxes))]
            )

        overlay = plot_prediction_np(
            sample.img,
            np.asarray(labels, np.int32),
            np.ones(len(boxes)),
            np.asarray(boxes, np.float32).reshape(-1, 4),
            mask_np=masks,
            class_names=class_list or None,
        )
        Image.fromarray(overlay).save(out_dir / f"{id}.png")
        print(f"rendered {id}", flush=True)


if __name__ == "__main__":
    main()
