"""Omniverse Replicator BasicWriter output -> canonical dataset dir.

Parity target: ``datasets/convert/convert_replicator.py`` — per sample:
- pinhole projection built from the OpenGL projection matrix (:150-157);
- camera pose from ``cameraViewTransform`` with orthonormalization and
  meters-per-scene-unit scaling (:158-162);
- the Omniverse camera-base -> standard camera frame fix (x right,
  y down, z out; :66);
- per-object ``cam_t_object``, rpy, distance, 3D bbox corners in the
  camera frame (:213-254);
- instance-segmentation id -> object-index remap, 255 background
  (:204-211);
- dataset dir with ``splits.json`` / ``classes.json`` / ``meta.json``
  (md5 dirhash + human-readable dataset id; :284-354).

Dependencies trimmed: spatialmath / dirhash / human_id / tqdm are
replaced with numpy SE3 math, ops.se3, and local helpers.
"""

from __future__ import annotations

import argparse
import datetime
import glob
import json
import random
import re
from math import pi
from pathlib import Path
from typing import List, Set

import numpy as np
from PIL import Image

from tauv_vision_tpu.data.dataset_dir import dirhash

# camera_base: Omniverse default frame (x right, y up, z in);
# camera: standard frame (x right, y down, z out).  Rotation about x
# by pi: y -> -y, z -> -z.
CAM_BASE_T_CAM = np.array(
    [
        [1, 0, 0, 0],
        [0, -1, 0, 0],
        [0, 0, -1, 0],
        [0, 0, 0, 1],
    ],
    dtype=np.float64,
)

_ADJECTIVES = (
    "amber", "brave", "calm", "deep", "eager", "fast", "green", "happy",
    "iron", "jolly", "kind", "lucky", "mellow", "noble", "open", "proud",
    "quiet", "rapid", "solid", "tidy", "upbeat", "vivid", "warm", "young",
)
_NOUNS = (
    "anchor", "beacon", "current", "dolphin", "eddy", "fathom", "gull",
    "harbor", "island", "jetty", "kelp", "lagoon", "marlin", "nautilus",
    "ocean", "pearl", "quay", "reef", "sonar", "tide", "urchin", "vessel",
    "wave", "yacht",
)


def generate_human_id(word_count: int = 3, rng: random.Random | None = None) -> str:
    rng = rng or random.Random()
    words = [rng.choice(_ADJECTIVES) for _ in range(word_count - 1)]
    words.append(rng.choice(_NOUNS))
    return "-".join(words)


def wrap(angle: float) -> float:
    return (angle + pi) % (2 * pi) - pi


def orthonormalize(r: np.ndarray) -> np.ndarray:
    """Symmetric first-order re-orthonormalization (:22-41)."""
    r = r.astype(np.float64)
    x, y, z = r[:, 0], r[:, 1], r[:, 2]
    x = x / np.linalg.norm(x)
    y = y / np.linalg.norm(y)
    z = z / np.linalg.norm(z)
    exy = 0.5 * np.dot(x, y)
    eyz = 0.5 * np.dot(y, z)
    ezx = 0.5 * np.dot(z, x)
    return np.vstack(
        (
            x - exy * y - ezx * z,
            y - exy * x - eyz * z,
            z - ezx * x - eyz * y,
        )
    ).T


def se3_inv(t: np.ndarray) -> np.ndarray:
    out = np.eye(4)
    out[:3, :3] = t[:3, :3].T
    out[:3, 3] = -t[:3, :3].T @ t[:3, 3]
    return out


def rpy_zyx(r: np.ndarray):
    """(roll, pitch, yaw) such that R = Rz(yaw) @ Ry(pitch) @ Rx(roll) —
    spatialmath's .rpy() convention (order='zyx' default returns
    [roll, pitch, yaw]; the reference reads indices [2], [1], [0] as
    yaw, pitch, roll respectively... but names them roll=rpy()[2],
    pitch=rpy()[1], yaw=rpy()[0]).  spatialmath rpy() returns
    [roll, pitch, yaw]; the reference therefore SWAPS roll and yaw
    (convert_replicator.py:252-254) — a latent bug we do not replicate:
    we emit roll=rpy[0], pitch=rpy[1], yaw=rpy[2]."""
    pitch = np.arcsin(np.clip(-r[2, 0], -1.0, 1.0))
    roll = np.arctan2(r[2, 1], r[2, 2])
    yaw = np.arctan2(r[1, 0], r[0, 0])
    return roll, pitch, yaw


def get_sample_ids(replicator_out_dir: Path) -> List[str]:
    rgb_names = glob.glob("rgb*", root_dir=str(replicator_out_dir))
    sample_id_re = re.compile(r"(?<=rgb_)(.*?)(?=\.png)")
    sample_ids = []
    for rgb_name in rgb_names:
        match = re.search(sample_id_re, rgb_name)
        if match is None:
            raise ValueError(f"malformed rgb file name: {rgb_name}")
        sample_ids.append(match.group(1))
    return sorted(sample_ids)


def split(pop: List, fractions: List[float], rng: random.Random) -> List[List]:
    out = []
    pop = list(pop)
    pop_size = len(pop)
    for fraction in fractions[:-1]:
        chosen = rng.sample(pop, int(fraction * pop_size))
        pop = [x for x in pop if x not in chosen]
        out.append(chosen)
    out.append(pop)
    return out


def convert_sample(
    replicator_out_dir: Path, dataset_dir: Path, sample_id: str
) -> Set[str]:
    rgb_pil = Image.open(replicator_out_dir / f"rgb_{sample_id}.png")
    seg_pil = Image.open(
        replicator_out_dir / f"instance_segmentation_{sample_id}.png"
    )

    bboxes = np.load(
        replicator_out_dir / f"bounding_box_2d_tight_{sample_id}.npy"
    )
    with open(
        replicator_out_dir / f"bounding_box_2d_tight_labels_{sample_id}.json"
    ) as fp:
        bbox_classes = json.load(fp)
    with open(
        replicator_out_dir / f"bounding_box_2d_tight_prim_paths_{sample_id}.json"
    ) as fp:
        bbox_instances = json.load(fp)
    with open(
        replicator_out_dir / f"instance_segmentation_mapping_{sample_id}.json"
    ) as fp:
        seg_instances = json.load(fp)
    bboxes_3d = np.load(
        replicator_out_dir / f"bounding_box_3d_{sample_id}.npy", allow_pickle=True
    )
    with open(
        replicator_out_dir / f"bounding_box_3d_prim_paths_{sample_id}.json"
    ) as fp:
        bbox_3d_instances = json.load(fp)

    camera_path = replicator_out_dir / f"camera_params_{sample_id}.json"
    if not camera_path.exists():
        camera_path = replicator_out_dir / "camera_params_0_0000.json"
    with open(camera_path) as fp:
        camera_raw = json.load(fp)

    seg_instances = {v: k for k, v in seg_instances.items()}

    w, h = rgb_pil.size
    units_to_m = camera_raw["metersPerSceneUnit"]

    # OpenGL projection -> pinhole intrinsics (:150-157).
    gl = np.array(camera_raw["cameraProjection"]).reshape(4, 4).T
    projection = np.array(
        [
            [gl[0, 0] * w / 2, 0, w / 2, 0],
            [0, gl[1, 1] * h / 2, h / 2, 0],
            [0, 0, 1, 0],
        ]
    )

    world_t_cam_base = np.array(
        camera_raw["cameraViewTransform"]
    ).reshape(4, 4).T.astype(np.float64)
    world_t_cam_base[:3, :3] = orthonormalize(world_t_cam_base[:3, :3])
    world_t_cam_base[:3, 3] *= units_to_m

    seg_raw = np.array(seg_pil)
    seg_out = np.full((h, w), 255, np.uint8)

    objects = []
    class_ids: Set[str] = set()

    for object_i in range(len(bboxes)):
        row = bboxes[object_i]
        bbox_class_index, x0, y0, x1, y1, occlusion = (
            int(row[0]), float(row[1]), float(row[2]), float(row[3]),
            float(row[4]), float(row[5]),
        )

        if bbox_instances[object_i] not in bbox_3d_instances:
            continue
        bbox_3d_i = bbox_3d_instances.index(bbox_instances[object_i])
        row3d = bboxes_3d[bbox_3d_i]
        x0_3d, y0_3d, z0_3d = float(row3d[1]), float(row3d[2]), float(row3d[3])
        x1_3d, y1_3d, z1_3d = float(row3d[4]), float(row3d[5]), float(row3d[6])
        transform_3d = np.array(row3d[7], dtype=np.float64)

        class_id = bbox_classes[str(bbox_class_index)]["class"].split(",")[-1]

        if bbox_instances[object_i] in seg_instances:
            seg_value = int(seg_instances[bbox_instances[object_i]])
            seg_out = np.where(seg_raw == seg_value, object_i, seg_out).astype(
                np.uint8
            )

        world_t_object = transform_3d.T.astype(np.float64)
        norms = np.linalg.norm(world_t_object[:, 0:3], axis=0)
        world_t_object[:, 0:3] = world_t_object[:, 0:3] / norms
        world_t_object[0:3, 3] *= units_to_m
        world_t_object[0:3, 0:3] = orthonormalize(world_t_object[0:3, 0:3])

        cam_t_object = (
            se3_inv(CAM_BASE_T_CAM) @ se3_inv(world_t_cam_base) @ world_t_object
        )

        p0_obj = units_to_m * np.array([x0_3d, y0_3d, z0_3d, 1.0])
        p1_obj = units_to_m * np.array([x1_3d, y1_3d, z1_3d, 1.0])
        p0_cam = (cam_t_object @ p0_obj)[:3]
        p1_cam = (cam_t_object @ p1_obj)[:3]

        roll, pitch, yaw = rpy_zyx(cam_t_object[:3, :3])

        objects.append(
            {
                "label": class_id,
                "class_id": class_id,
                "visibility": round(1 - occlusion, 4),
                "bbox": {
                    "y": round(((y0 + y1) / 2) / h, 4),
                    "x": round(((x0 + x1) / 2) / w, 4),
                    "h": round(abs(y1 - y0) / h, 4),
                    "w": round(abs(x1 - x0) / w, 4),
                },
                "bbox_3d": {
                    "x0": round(p0_cam[0], 4),
                    "y0": round(p0_cam[1], 4),
                    "z0": round(p0_cam[2], 4),
                    "x1": round(p1_cam[0], 4),
                    "y1": round(p1_cam[1], 4),
                    "z1": round(p1_cam[2], 4),
                },
                "pose": {
                    "x": round(cam_t_object[0, 3], 4),
                    "y": round(cam_t_object[1, 3], 4),
                    "z": round(cam_t_object[2, 3], 4),
                    "distance": round(
                        float(np.linalg.norm(cam_t_object[:3, 3])), 4
                    ),
                    "roll": round(wrap(roll), 4),
                    "pitch": round(wrap(pitch), 4),
                    "yaw": round(wrap(yaw), 4),
                    "cam_t_object": [
                        round(float(v), 12) for v in cam_t_object.flatten()
                    ],
                },
            }
        )
        class_ids.add(class_id)

    camera = {
        "fy": round(projection[1, 1], 4),
        "fx": round(projection[0, 0], 4),
        "cy": round(projection[1, 2], 4),
        "cx": round(projection[0, 2], 4),
        "h": int(camera_raw["renderProductResolution"][1]),
        "w": int(camera_raw["renderProductResolution"][0]),
        "projection": [round(float(v), 12) for v in projection.flatten()],
    }

    data_dir = dataset_dir / "data"
    rgb_pil.save(data_dir / f"{sample_id}.png")
    Image.fromarray(seg_out).save(data_dir / f"{sample_id}_seg.png")
    with open(data_dir / f"{sample_id}.json", "w") as fp:
        json.dump({"camera": camera, "objects": objects}, fp, indent="  ")

    return class_ids


def convert(
    replicator_out_dir: Path,
    datasets_dir: Path,
    splits: List[float],
    email: str,
    description: str,
    seed: int | None = None,
):
    if not np.isclose(sum(splits), 1):
        raise ValueError("Error: splits must sum to 1")
    if not replicator_out_dir.is_dir():
        raise ValueError(f"Error: {replicator_out_dir} does not exist")
    if not datasets_dir.is_dir():
        raise ValueError(f"Error: {datasets_dir} does not exist")

    rng = random.Random(seed)
    dataset_id = generate_human_id(3, rng)
    dataset_dir = datasets_dir / dataset_id
    if dataset_dir.exists():
        raise ValueError(f"Error: {dataset_dir} already exists")

    print(f"Creating dataset {dataset_dir}...")
    dataset_dir.mkdir()
    (dataset_dir / "data").mkdir()

    sample_ids = get_sample_ids(replicator_out_dir)

    class_ids: Set[str] = set()
    for sample_id in sample_ids:
        class_ids |= convert_sample(replicator_out_dir, dataset_dir, sample_id)

    id_splits = split(sample_ids, splits, rng)
    with open(dataset_dir / "splits.json", "w") as fp:
        json.dump(
            {
                "splits": {
                    "train": id_splits[0],
                    "val": id_splits[1],
                    "test": id_splits[2],
                }
            },
            fp,
            indent="  ",
        )

    with open(dataset_dir / "classes.json", "w") as fp:
        json.dump(
            {"classes": [{"id": class_id} for class_id in sorted(class_ids)]},
            fp,
            indent="  ",
        )

    meta = {
        "author": email,
        "has_seg": True,
        "has_pose": True,
        "timestamp": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        ),
        "description": description,
        "human_id": dataset_id,
        "md5": dirhash(dataset_dir),
    }
    with open(dataset_dir / "meta.json", "w") as fp:
        json.dump(meta, fp, indent="  ")

    print(f"Created dataset {dataset_dir}")
    return dataset_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("replicator_out_dir")
    parser.add_argument("datasets_dir")
    parser.add_argument("--splits", type=float, nargs=3, required=True)
    parser.add_argument("--email", type=str, required=True)
    parser.add_argument("--description", type=str, required=True)
    args = parser.parse_args()

    convert(
        Path(args.replicator_out_dir).expanduser(),
        Path(args.datasets_dir).expanduser(),
        args.splits,
        args.email,
        args.description,
    )


if __name__ == "__main__":
    main()
