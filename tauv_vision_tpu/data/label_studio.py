"""Label Studio annotation tooling.

Parity targets:
- ``processing/process_label_studio.py`` — Label Studio export JSON ->
  dataset samples: percent bboxes -> normalized (y, x, h, w) (:107-117),
  brush-mask RLE -> instance seg map (:120-135).  The reference calls a
  removed ``SegmentationSample.save`` (stale); writing goes through
  ``data.dataset_dir.write_sample`` here.
- ``label_studio/split_dataset.py`` — random annotation batches
  (+ optional zip) for upload.

The brush RLE codec implements Label Studio's format (32-bit count,
5-bit word size, four 4-bit run-length sizes, then tagged runs) with
numpy bit unpacking rather than the reference's vendored
string-of-bits decoder.
"""

from __future__ import annotations

import argparse
import glob
import json
import pathlib
import random
import re
import zipfile
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from tauv_vision_tpu.data.dataset_dir import DatasetSample, write_sample


class _BitReader:
    """MSB-first bit reader over a byte buffer."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self._pos = 0

    def read(self, n_bits: int) -> int:
        chunk = self._bits[self._pos: self._pos + n_bits]
        self._pos += n_bits
        value = 0
        for bit in chunk:
            value = (value << 1) | int(bit)
        return value


def decode_brush_rle(rle: List[int]) -> np.ndarray:
    """Decode a Label Studio brush RLE into a flat uint8 array
    (RGBA pixel stream; callers reshape to [h, w, 4]).

    Uses the native C++ codec (native/rle.cc) when available — the
    bit-by-bit Python walk is ~100x slower on full-resolution masks —
    with this Python implementation as the fallback.
    """
    from tauv_vision_tpu import native

    header = _BitReader(bytes(bytearray(rle[:6])))
    n_elements = header.read(32)
    decoded = native.brush_rle_decode(rle, n_elements)
    if decoded is not None:
        return decoded

    reader = _BitReader(bytes(bytearray(rle)))
    num = reader.read(32)
    word_size = reader.read(5) + 1
    rle_sizes = [reader.read(4) + 1 for _ in range(4)]

    out = np.zeros(num, dtype=np.uint8)
    i = 0
    while i < num:
        is_run = reader.read(1)
        j = i + 1 + reader.read(rle_sizes[reader.read(2)])
        if is_run:
            out[i:j] = reader.read(word_size)
            i = j
        else:
            while i < j:
                out[i] = reader.read(word_size)
                i += 1
    return out


def encode_brush_rle(values: np.ndarray) -> List[int]:
    """Inverse of :func:`decode_brush_rle` (verbatim-block encoding only;
    used for round-trip tests and synthetic fixtures)."""
    values = np.asarray(values, np.uint8).ravel()
    bits: List[int] = []

    def write(value: int, n_bits: int):
        for shift in range(n_bits - 1, -1, -1):
            bits.append((value >> shift) & 1)

    write(len(values), 32)
    write(8 - 1, 5)           # word_size = 8
    for _ in range(4):
        write(16 - 1, 4)      # rle_sizes = [16]*4

    i = 0
    while i < len(values):
        j = min(i + 65535, len(values))
        write(0, 1)           # verbatim block
        write(0, 2)           # size selector 0 -> 16 bits
        write(j - i - 1, 16)
        for v in values[i:j]:
            write(int(v), 8)
        i = j

    padded = bits + [0] * ((8 - len(bits) % 8) % 8)
    return [int(v) for v in np.packbits(np.asarray(padded, np.uint8))]


def convert_annotations(
    images_dir: pathlib.Path,
    raw_labels_dir: pathlib.Path,
    dataset_dir: pathlib.Path,
    classification_indices: Dict[str, int],
) -> List[str]:
    """Label Studio export JSONs -> dataset samples.  Returns sample ids."""
    ids = []
    label_names = glob.glob("*.json", root_dir=str(raw_labels_dir))
    for name in sorted(label_names):
        with open(raw_labels_dir / name) as fp:
            data = json.load(fp)

        for annotation in data:
            if "bounding_box" not in annotation:
                continue

            match = re.search(r"\/([^\/]+\.png)", annotation["image"])
            if match is None:
                continue
            img_name = match.group(1)
            id = img_name.split(".")[0]

            img = np.asarray(
                Image.open(images_dir / img_name).convert("RGB")
            )
            img_h, img_w = img.shape[:2]

            seg = np.full((img_h, img_w), 255, np.uint8)
            objects = []
            detection_by_class: Dict[int, int] = {}

            for detection_i, bb in enumerate(annotation["bounding_box"]):
                label = bb["rectanglelabels"][0]
                class_index = classification_indices[label]
                detection_by_class[class_index] = detection_i
                # Label Studio boxes are percent top-left + size.
                objects.append(
                    {
                        "label": label,
                        "class_id": label,
                        "bbox": {
                            "x": (bb["x"] + bb["width"] / 2) / 100,
                            "y": (bb["y"] + bb["height"] / 2) / 100,
                            "w": bb["width"] / 100,
                            "h": bb["height"] / 100,
                        },
                    }
                )

            for mask_data in annotation.get("mask", []):
                label = mask_data["brushlabels"][0]
                detection_i = detection_by_class[
                    classification_indices[label]
                ]
                mask = decode_brush_rle(mask_data["rle"]).reshape(
                    (img_h, img_w, 4)
                )[:, :, -1]
                seg = np.where(mask == 255, detection_i, seg).astype(np.uint8)

            write_sample(
                dataset_dir / "data",
                DatasetSample(
                    id=id, img=img, seg=seg, objects=objects,
                    camera={"h": img_h, "w": img_w},
                ),
            )
            ids.append(id)
    return ids


def split_for_annotation(
    images_dir: pathlib.Path,
    out_dir: pathlib.Path,
    batch_size: int,
    make_zip: bool = False,
    seed: Optional[int] = None,
) -> List[pathlib.Path]:
    """Random image batches (+ optional zips) for annotation upload
    (label_studio/split_dataset.py)."""
    images = sorted(
        p for p in images_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    random.Random(seed).shuffle(images)

    out_dir.mkdir(parents=True, exist_ok=True)
    batch_dirs = []
    for batch_i in range(0, len(images), batch_size):
        batch = images[batch_i: batch_i + batch_size]
        batch_dir = out_dir / f"batch_{batch_i // batch_size:04d}"
        batch_dir.mkdir(exist_ok=True)
        for img in batch:
            (batch_dir / img.name).write_bytes(img.read_bytes())
        if make_zip:
            with zipfile.ZipFile(batch_dir.with_suffix(".zip"), "w") as zf:
                for img in batch:
                    zf.write(batch_dir / img.name, img.name)
        batch_dirs.append(batch_dir)
    return batch_dirs


def launch(document_root) -> int:
    """Launch a local Label Studio instance serving files from
    ``document_root`` (the reference's label_studio/label_studio.sh:1-13
    as a callable: sets the local-file-serving env and execs
    ``label-studio``).  Returns the process exit code; 127 when the
    ``label-studio`` executable is not installed."""
    import os
    import subprocess

    env = dict(os.environ)
    env["LABEL_STUDIO_LOCAL_FILES_SERVING_ENABLED"] = "true"
    env["LABEL_STUDIO_LOCAL_FILES_DOCUMENT_ROOT"] = str(document_root)
    try:
        return subprocess.call(["label-studio"], env=env)
    except FileNotFoundError:
        print("label-studio is not installed (pip install label-studio)")
        return 127


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dir")
    parser.add_argument("--launch", action="store_true",
                        help="launch Label Studio serving DIR instead of "
                             "converting annotations")
    parser.add_argument("--classes", nargs="+",
                        help="class ids in index order (required unless "
                             "--launch)")
    args = parser.parse_args()

    base = pathlib.Path(args.dir).expanduser()
    if args.launch:
        raise SystemExit(launch(base))
    if not args.classes:
        parser.error("--classes is required for annotation conversion")
    convert_annotations(
        base / "images",
        base / "raw_labels",
        base / "all",
        {c: i for i, c in enumerate(args.classes)},
    )


if __name__ == "__main__":
    main()
