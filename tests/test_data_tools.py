"""Data-production tooling tests: replicator converter, Label Studio
RLE + annotation conversion, Falling Things loader — all on synthetic
fixtures exercising the real on-disk formats."""

import json
import pathlib

import numpy as np
import pytest
from PIL import Image

from tauv_vision_tpu.data import convert_replicator, label_studio
from tauv_vision_tpu.data.falling_things import (
    FallingThingsDataset,
    FallingThingsEnvironment,
    FallingThingsObject,
    FallingThingsVariant,
    quat_xyzw_to_rotm,
)


# ---------------------------------------------------------------------------
# Replicator converter
# ---------------------------------------------------------------------------

def _make_replicator_output(root: pathlib.Path, n: int = 3, h: int = 48, w: int = 64):
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    # OpenGL projection with fx = fy = 100 px: gl[0,0] = 2*fx/w.
    gl = np.zeros((4, 4))
    gl[0, 0] = 2 * 100.0 / w
    gl[1, 1] = 2 * 100.0 / h
    gl[2, 2] = -1
    gl[3, 2] = -1
    camera = {
        "metersPerSceneUnit": 0.01,
        "cameraProjection": list(gl.T.flatten()),
        # camera at origin, identity orientation (row-major transpose).
        "cameraViewTransform": list(np.eye(4).flatten()),
        "renderProductResolution": [w, h],
    }
    for i in range(n):
        sid = f"0_{i:04d}"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(root / f"rgb_{sid}.png")
        seg = np.zeros((h, w), np.uint8)
        seg[10:30, 20:40] = 7  # exporter instance id
        Image.fromarray(seg).save(root / f"instance_segmentation_{sid}.png")

        # one object: 2D box + 3D box.
        bbox = np.array(
            [(0, 20.0, 10.0, 40.0, 30.0, 0.1)],
            dtype=[("c", "i4"), ("x0", "f4"), ("y0", "f4"), ("x1", "f4"),
                   ("y1", "f4"), ("occ", "f4")],
        )
        np.save(root / f"bounding_box_2d_tight_{sid}.npy", bbox)
        with open(root / f"bounding_box_2d_tight_labels_{sid}.json", "w") as fp:
            json.dump({"0": {"class": "class,torpedo"}}, fp)
        with open(root / f"bounding_box_2d_tight_prim_paths_{sid}.json", "w") as fp:
            json.dump(["/World/torpedo"], fp)
        with open(root / f"instance_segmentation_mapping_{sid}.json", "w") as fp:
            json.dump({"7": "/World/torpedo"}, fp)

        # object 2m in front of camera-base -z... object at z=-200 units in
        # omniverse base frame -> +2m on the camera z axis.
        transform = np.eye(4)
        transform[3, :3] = [0, 0, -200.0]  # row-major (transposed later)
        bbox3d = np.array(
            [(0, -10.0, -10.0, -10.0, 10.0, 10.0, 10.0, transform, 0.1)],
            dtype=[("c", "i4"), ("x0", "f4"), ("y0", "f4"), ("z0", "f4"),
                   ("x1", "f4"), ("y1", "f4"), ("z1", "f4"),
                   ("t", "f8", (4, 4)), ("occ", "f4")],
        )
        np.save(root / f"bounding_box_3d_{sid}.npy", bbox3d)
        with open(root / f"bounding_box_3d_prim_paths_{sid}.json", "w") as fp:
            json.dump(["/World/torpedo"], fp)
    with open(root / "camera_params_0_0000.json", "w") as fp:
        json.dump(camera, fp)
    return n


def test_convert_replicator_end_to_end(tmp_path):
    replicator_dir = tmp_path / "replicator"
    datasets_dir = tmp_path / "datasets"
    datasets_dir.mkdir()
    _make_replicator_output(replicator_dir)

    out = convert_replicator.convert(
        replicator_dir, datasets_dir, [0.5, 0.25, 0.25],
        "test@test", "synthetic", seed=0,
    )

    with open(out / "meta.json") as fp:
        meta = json.load(fp)
    assert meta["author"] == "test@test"
    assert len(meta["md5"]) == 32

    with open(out / "splits.json") as fp:
        splits = json.load(fp)["splits"]
    assert sum(len(v) for v in splits.values()) == 3

    with open(out / "classes.json") as fp:
        classes = json.load(fp)["classes"]
    assert classes == [{"id": "torpedo"}]

    sid = (splits["train"] + splits["val"] + splits["test"])[0]
    with open(out / "data" / f"{sid}.json") as fp:
        data = json.load(fp)
    obj = data["objects"][0]
    # Camera at origin; object 200 units * 0.01 m/unit = 2 m along -z in
    # the omniverse base frame -> +2 m camera z.
    assert obj["pose"]["z"] == pytest.approx(2.0, abs=1e-3)
    assert obj["pose"]["distance"] == pytest.approx(2.0, abs=1e-3)
    assert obj["bbox"]["y"] == pytest.approx(20.0 / 48, abs=1e-4)
    assert obj["bbox"]["x"] == pytest.approx(30.0 / 64, abs=1e-4)
    assert obj["bbox"]["h"] == pytest.approx(20.0 / 48, abs=1e-4)
    assert obj["bbox"]["w"] == pytest.approx(20.0 / 64, abs=1e-4)
    assert data["camera"]["fx"] == pytest.approx(100.0)

    seg = np.asarray(Image.open(out / "data" / f"{sid}_seg.png"))
    assert (seg == 0).sum() == 20 * 20  # instance 7 remapped to object 0
    assert (seg == 255).sum() == 48 * 64 - 400


def test_orthonormalize():
    rng = np.random.default_rng(1)
    r = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    noisy = r + rng.normal(size=(3, 3)) * 0.01
    fixed = convert_replicator.orthonormalize(noisy)
    np.testing.assert_allclose(fixed @ fixed.T, np.eye(3), atol=1e-3)


# ---------------------------------------------------------------------------
# Label Studio
# ---------------------------------------------------------------------------

def test_brush_rle_roundtrip():
    rng = np.random.default_rng(2)
    mask = (rng.uniform(size=(16, 20)) > 0.6).astype(np.uint8) * 255
    rgba = np.zeros((16, 20, 4), np.uint8)
    rgba[..., 3] = mask
    rle = label_studio.encode_brush_rle(rgba.ravel())
    decoded = label_studio.decode_brush_rle(rle).reshape(16, 20, 4)
    np.testing.assert_array_equal(decoded, rgba)


def test_label_studio_conversion(tmp_path):
    images_dir = tmp_path / "images"
    labels_dir = tmp_path / "raw_labels"
    dataset_dir = tmp_path / "all"
    images_dir.mkdir(), labels_dir.mkdir()

    h, w = 24, 32
    rng = np.random.default_rng(3)
    Image.fromarray(
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    ).save(images_dir / "frame0.png")

    mask = np.zeros((h, w, 4), np.uint8)
    mask[5:15, 8:20, 3] = 255
    export = [
        {
            "image": "/data/upload/frame0.png",
            "bounding_box": [
                {"rectanglelabels": ["torpedo"], "x": 25.0, "y": 20.0,
                 "width": 37.5, "height": 41.7}
            ],
            "mask": [
                {"brushlabels": ["torpedo"],
                 "rle": label_studio.encode_brush_rle(mask.ravel())}
            ],
        }
    ]
    with open(labels_dir / "export.json", "w") as fp:
        json.dump(export, fp)

    ids = label_studio.convert_annotations(
        images_dir, labels_dir, dataset_dir, {"torpedo": 0}
    )
    assert ids == ["frame0"]
    with open(dataset_dir / "data" / "frame0.json") as fp:
        data = json.load(fp)
    bb = data["objects"][0]["bbox"]
    assert bb["x"] == pytest.approx((25.0 + 37.5 / 2) / 100)
    seg = np.asarray(Image.open(dataset_dir / "data" / "frame0_seg.png"))
    assert (seg == 0).sum() == 10 * 12


def test_split_for_annotation(tmp_path):
    images = tmp_path / "imgs"
    images.mkdir()
    for i in range(7):
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            images / f"f{i}.png"
        )
    batches = label_studio.split_for_annotation(
        images, tmp_path / "batches", batch_size=3, make_zip=True, seed=0
    )
    assert len(batches) == 3
    total = sum(len(list(b.glob("*.png"))) for b in batches)
    assert total == 7
    assert (tmp_path / "batches" / "batch_0000.zip").exists()


# ---------------------------------------------------------------------------
# Falling Things
# ---------------------------------------------------------------------------

def _make_fat_scene(scene_dir: pathlib.Path, n_frames: int = 2, empty_first=False):
    scene_dir.mkdir(parents=True)
    h, w = 32, 48
    with open(scene_dir / "_camera_settings.json", "w") as fp:
        json.dump(
            {"camera_settings": [
                {"intrinsic_settings": {"fx": 80.0, "fy": 80.0,
                                        "cx": 24.0, "cy": 16.0}}
            ]},
            fp,
        )
    with open(scene_dir / "_object_settings.json", "w") as fp:
        json.dump(
            {"exported_objects": [
                {"class": "011_banana_16k", "segmentation_class_id": 12}
            ]},
            fp,
        )
    rng = np.random.default_rng(4)
    for i in range(n_frames):
        sid = f"{i:06d}"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(scene_dir / f"{sid}.left.jpg")
        seg = np.zeros((h, w), np.uint8)
        seg[4:12, 6:18] = 12
        Image.fromarray(seg).save(scene_dir / f"{sid}.left.seg.png")
        depth = (np.full((h, w), 2.5) * 1e4).astype(np.uint16)
        Image.fromarray(depth).save(scene_dir / f"{sid}.left.depth.png")

        objects = []
        if not (empty_first and i == 0):
            objects = [
                {
                    "class": "011_banana_16k",
                    "bounding_box": {"top_left": [4.0, 6.0],
                                     "bottom_right": [12.0, 18.0]},
                    "cuboid": [[0, 0, 0]] * 8,
                    "projected_cuboid": [[10.0, 8.0]] * 8,
                    "location": [10.0, 20.0, 150.0],
                    "quaternion_xyzw": [0, 0, 0, 1],
                }
            ]
        with open(scene_dir / f"{sid}.left.json", "w") as fp:
            json.dump(
                {
                    "camera_data": {
                        "location_worldframe": [0.0, 0.0, 0.0],
                        "quaternion_xyzw_worldframe": [0, 0, 0, 1],
                    },
                    "objects": objects,
                },
                fp,
            )


def test_falling_things_loader(tmp_path):
    scene = (
        tmp_path / "single" / FallingThingsObject.Banana.value / "kitchen_0"
    )
    _make_fat_scene(scene, n_frames=2, empty_first=True)

    ds = FallingThingsDataset(
        str(tmp_path), FallingThingsVariant.SINGLE,
        [FallingThingsEnvironment.Kitchen0],
        objects=[FallingThingsObject.Banana],
    )
    assert len(ds) == 2
    sample = ds[0]  # frame 0 is empty -> skips to frame 1
    banana_id = 10  # 10th member, index 9 + 1
    assert sample.classifications[0] == banana_id
    np.testing.assert_allclose(sample.intrinsics, [80, 80, 24, 16])
    # seg remapped from exporter id 12 to class id.
    assert (sample.seg_map == banana_id).sum() == 8 * 12
    np.testing.assert_allclose(sample.depth_map, 2.5, atol=1e-3)
    # location cm -> m.
    np.testing.assert_allclose(sample.poses[0, :3], [0.1, 0.2, 1.5])
    # box normalized (y, x, h, w).
    np.testing.assert_allclose(
        sample.bounding_boxes[0],
        [(4 + 12) / 2 / 32, (6 + 18) / 2 / 48, 8 / 32, 12 / 48],
        atol=1e-6,
    )
    # projected cuboid: center prepended, (y, x) order.
    assert sample.projected_cuboids.shape == (1, 9, 2)
    np.testing.assert_allclose(sample.projected_cuboids[0, 1], [8.0, 10.0])


def test_quat_to_rotm():
    # 90 degrees about z: (x,y,z,w) = (0,0,sin45,cos45).
    q = np.array([0, 0, np.sqrt(0.5), np.sqrt(0.5)])
    r = quat_xyzw_to_rotm(q)
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-9)


def test_frc_tank_preset():
    """The pool-scene preset (randomize_frc_tank.py parity) is a complete
    RandomizeConfig with the reference scene's values."""
    from tauv_vision_tpu.data.replicator_randomize import (
        FRC_TANK_CONFIG,
        write_camera_params_probe,
    )

    cfg = FRC_TANK_CONFIG
    assert cfg.camera_position == (0.0, 800.0, 0.0)
    assert cfg.camera_rotation == (-90.0, 0.0, 0.0)
    assert not cfg.enable_sun and not cfg.enable_environment_offset
    assert cfg.sky_intensity == (50.0, 1000.0)
    assert cfg.water_scattering == (0.01, 0.1)
    assert len(cfg.placements) == 1
    assert cfg.placements[0].randomize_color
    # Outside Omniverse both entry points raise the clear error.
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="Omniverse"):
        write_camera_params_probe(cfg)
