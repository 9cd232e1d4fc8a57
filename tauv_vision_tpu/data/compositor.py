"""Underwater compositor + flat splitter (offline data production).

Parity targets:
- ``replicator/post_process.py`` — RGBA renders composited over real
  pool backgrounds with a Beer-Lambert water attenuation model
  (:55-63): transmission = max(exp(-beta * depth), 0.1), the object is
  color-shifted toward the background's mean lighting with depth, then
  alpha-blended over the background.  The reference writes through a
  removed ``SegmentationSample.save`` (stale); here samples go through
  ``dataset_dir.write_sample``.  multiprocessing.Pool -> ThreadPool
  (numpy releases the GIL).
- ``replicator/random_split.py`` — copy id-grouped files into
  train/val/test directories.
"""

from __future__ import annotations

import argparse
import glob
import json
import pathlib
import random
import re
import shutil
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from tauv_vision_tpu.data.dataset_dir import DatasetSample, write_sample


def beer_lambert_composite(
    rgba: np.ndarray,
    depth: np.ndarray,
    background: np.ndarray,
    rng: np.random.Generator,
    beta_range: Tuple[float, float] = (0.1, 0.2),
    lighting_jitter: float = 0.05,
    min_transmission: float = 0.1,
) -> np.ndarray:
    """Composite an RGBA render over a background with water attenuation.

    rgba: [H, W, 4] uint8; depth: [H, W] meters; background: [H, W, 3]
    uint8.  Returns [H, W, 3] uint8.
    """
    rgb = rgba[..., :3].astype(np.float32) / 255.0
    alpha = rgba[..., 3].astype(np.float32) / 255.0
    bg = background.astype(np.float32) / 255.0

    lighting = bg.reshape(-1, 3).mean(axis=0) + rng.uniform(
        -lighting_jitter, lighting_jitter, (3,)
    )
    beta = rng.uniform(*beta_range)

    transmission = np.maximum(np.exp(-beta * depth), min_transmission)
    rgb_adj = transmission[..., None] * rgb + (1 - transmission[..., None]) * lighting

    composite = alpha[..., None] * rgb_adj + (1 - alpha[..., None]) * bg
    return (np.clip(composite, 0, 1) * 255).astype(np.uint8)


def _get_id(path: pathlib.Path) -> str:
    match = re.search(r"_(\d+)\.", str(path))
    if not match:
        raise ValueError(f"no id in {path}")
    return match.group(1)


def post_process_sample(
    rgb_path: pathlib.Path,
    background_path: pathlib.Path,
    in_dir: pathlib.Path,
    out_dir: pathlib.Path,
    class_names: Dict[str, int],
    seed: Optional[int] = None,
) -> str:
    """One RGBA render -> composited dataset sample (post_process.py:32-150)."""
    id = _get_id(rgb_path)
    rng = np.random.default_rng(seed)

    rgba = np.asarray(Image.open(rgb_path))
    background = np.asarray(
        Image.open(background_path).convert("RGB").resize(
            (rgba.shape[1], rgba.shape[0])
        )
    )
    depth = np.load(in_dir / f"distance_to_camera_{id}.npy")

    composite = beer_lambert_composite(rgba, depth, background, rng)

    seg_raw = np.asarray(Image.open(in_dir / f"instance_segmentation_{id}.png"))
    if seg_raw.ndim == 3:
        seg_raw = seg_raw[..., 0]
    with open(in_dir / f"instance_segmentation_mapping_{id}.json") as fp:
        seg_instances = {v: k for k, v in json.load(fp).items()}

    bboxes = np.load(in_dir / f"bounding_box_2d_loose_{id}.npy")
    with open(in_dir / f"bounding_box_2d_loose_labels_{id}.json") as fp:
        bbox_classes = json.load(fp)
    with open(in_dir / f"bounding_box_2d_loose_prim_paths_{id}.json") as fp:
        bbox_instances = json.load(fp)

    h, w = composite.shape[:2]
    seg = np.full((h, w), 255, np.uint8)
    objects = []
    detection_i = 0
    for i in range(len(bboxes)):
        row = bboxes[i]
        bbox_class = int(row[0])
        x0, y0, x1, y1 = float(row[1]), float(row[2]), float(row[3]), float(row[4])
        class_name = bbox_classes[str(bbox_class)]["class"].split(",")[-1]
        if class_name not in class_names:
            continue
        if bbox_instances[i] in seg_instances:
            seg_value = int(seg_instances[bbox_instances[i]])
            seg = np.where(seg_raw == seg_value, detection_i, seg).astype(
                np.uint8
            )
        objects.append(
            {
                "label": class_name,
                "class_id": class_name,
                "bbox": {
                    "x": ((x0 + x1) / 2) / w,
                    "y": ((y0 + y1) / 2) / h,
                    "w": abs(x1 - x0) / w,
                    "h": abs(y1 - y0) / h,
                },
            }
        )
        detection_i += 1

    write_sample(
        out_dir / "data",
        DatasetSample(id=id, img=composite, seg=seg, objects=objects,
                      camera={"h": h, "w": w}),
    )
    return id


def post_process_all(
    in_dir: pathlib.Path,
    background_dir: pathlib.Path,
    out_dir: pathlib.Path,
    class_names: Dict[str, int],
    n_workers: int = 8,
    seed: int = 0,
) -> List[str]:
    rgb_paths = sorted(
        in_dir / name for name in glob.glob("rgb_*.png", root_dir=str(in_dir))
    )
    backgrounds = sorted(
        background_dir / name
        for name in glob.glob("*", root_dir=str(background_dir))
        if name.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    rng = random.Random(seed)

    def work(args):
        i, rgb_path = args
        background = backgrounds[rng.randrange(len(backgrounds))]
        return post_process_sample(
            rgb_path, background, in_dir, out_dir, class_names, seed + i
        )

    with ThreadPoolExecutor(n_workers) as pool:
        return list(pool.map(work, enumerate(rgb_paths)))


def random_split(
    in_dir: pathlib.Path,
    out_dirs: Dict[str, pathlib.Path],
    fractions: Dict[str, float],
    seed: Optional[int] = None,
) -> Dict[str, List[str]]:
    """Copy id-grouped files into split directories (random_split.py)."""
    if sum(fractions.values()) > 1 + 1e-9:
        raise ValueError("bad splits")

    ids = sorted(
        {
            m.group(1)
            for m in (
                re.search(r"(\d+)\.json", name)
                for name in glob.glob("*.json", root_dir=str(in_dir))
            )
            if m
        }
    )
    rng = random.Random(seed)
    n = len(ids)
    remaining = list(ids)
    assigned: Dict[str, List[str]] = {}
    names = list(fractions)
    for i, name in enumerate(names):
        if i == len(names) - 1 and abs(sum(fractions.values()) - 1) < 1e-9:
            chosen = list(remaining)
        else:
            chosen = rng.sample(remaining, round(fractions[name] * n))
        remaining = [x for x in remaining if x not in chosen]
        assigned[name] = chosen

    for name, split_ids in assigned.items():
        out = out_dirs[name]
        out.mkdir(parents=True, exist_ok=True)
        for id in split_ids:
            for file in in_dir.iterdir():
                if re.search(rf"(^|_){id}\.", file.name):
                    shutil.copy(file, out / file.name)
    return assigned


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("in_dir")
    parser.add_argument("background_dir")
    parser.add_argument("out_dir")
    parser.add_argument("--classes", nargs="+", required=True)
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args()

    post_process_all(
        pathlib.Path(args.in_dir).expanduser(),
        pathlib.Path(args.background_dir).expanduser(),
        pathlib.Path(args.out_dir).expanduser(),
        {c: i for i, c in enumerate(args.classes)},
        n_workers=args.workers,
    )


if __name__ == "__main__":
    main()
