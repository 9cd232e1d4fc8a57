"""Compositor, random split, YOLO-Pose decode, debug utils tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tauv_vision_tpu.data.compositor import beer_lambert_composite, random_split
from tauv_vision_tpu.utils.debug import StageTimer


def test_beer_lambert_composite():
    rng = np.random.default_rng(0)
    h, w = 24, 32
    rgba = np.zeros((h, w, 4), np.uint8)
    rgba[8:16, 8:16, :3] = 200
    rgba[8:16, 8:16, 3] = 255  # opaque object patch
    depth = np.full((h, w), 1.0, np.float32)
    background = np.full((h, w, 3), 50, np.uint8)

    out = beer_lambert_composite(
        rgba, depth, background, rng, beta_range=(0.15, 0.15),
        lighting_jitter=0.0,
    )
    assert out.shape == (h, w, 3)
    # Background visible where alpha = 0.
    np.testing.assert_array_equal(out[0, 0], [50, 50, 50])
    # Object region: attenuated object color blended toward lighting;
    # must be between the background mean and the raw object color.
    assert 50 < out[12, 12, 0] < 200

    # Deeper water attenuates more (pulls color toward background mean).
    deep = beer_lambert_composite(
        rgba, np.full((h, w), 10.0, np.float32), background, rng,
        beta_range=(0.15, 0.15), lighting_jitter=0.0,
    )
    assert deep[12, 12, 0] < out[12, 12, 0]


def test_random_split(tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(10):
        (in_dir / f"{i:04d}.json").write_text("{}")
        (in_dir / f"{i:04d}.png").write_text("x")
    out = {
        "train": tmp_path / "train",
        "val": tmp_path / "val",
        "test": tmp_path / "test",
    }
    assigned = random_split(
        in_dir, out, {"train": 0.6, "val": 0.2, "test": 0.2}, seed=0
    )
    assert sum(len(v) for v in assigned.values()) == 10
    n_train_files = len(list(out["train"].iterdir()))
    assert n_train_files == 2 * len(assigned["train"])


@pytest.mark.slow
def test_yolo_pose_decode():
    from tests.test_yolo_pose import CFG
    from tauv_vision_tpu.models.yolo_pose import YoloPose
    from tauv_vision_tpu.serving.yolo_pose_decode import decode_yolo_pose

    model = YoloPose(CFG)
    img = jnp.zeros((1, CFG.in_h, CFG.in_w, 3))
    variables = model.init(jax.random.key(0), img, train=False)
    pred = model.apply(variables, img, train=False)

    obj_points = jnp.asarray(
        np.random.default_rng(0).uniform(-0.1, 0.1, (3, 3)).astype(np.float32)
    )
    cam = jnp.asarray([[100.0, 0, 48], [0, 100.0, 32], [0, 0, 1]])
    out = decode_yolo_pose(
        pred, CFG, top_k=5, iou_threshold=0.5, confidence_threshold=0.0,
        keypoint_score_threshold=0.0,
        object_points=obj_points, camera_matrix=cam,
    )
    assert out.box.shape == (1, 5, 4)
    assert out.belief.shape[0:3] == (1, 5, 3)
    assert out.keypoint_y.shape == (1, 5, 3)
    assert out.pose_translation.shape == (1, 5, 3)
    # Peak positions are normalized coordinates.
    assert float(out.keypoint_y.max()) <= 1.0
    assert np.isfinite(np.asarray(out.keypoint_score)).all()


def test_stage_timer():
    timer = StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    assert timer.counts["a"] == 2
    assert "a=" in timer.report() and "b=" in timer.report()
