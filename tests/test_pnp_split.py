"""Probe-gated PnP dispatch split (serving/runtime_probe.py +
yolo_pose_decode.attach_pnp + make_yolo_pose_pipeline(split_pnp=...)).

The fused YOLO-Pose + in-graph PnP composition crashes some TPU
runtimes (BENCH.md; bisect ladder scripts/pnp_fusion_repro.py), so
serving gates the fusion on a runtime probe.  These verify the split
path computes identical poses and that the probe honors its override.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig
from tauv_vision_tpu.models.yolo_pose import YoloPose
from tauv_vision_tpu.serving import runtime_probe
from tauv_vision_tpu.serving.pipeline import make_yolo_pose_pipeline


def _tiny():
    cfg = YoloPoseModelConfig(
        in_w=64, in_h=64, feature_depth=16, n_classes=2,
        n_prototype_masks=4, belief_depth=5, affinity_depth=10,
        prototype_belief_depth=4, prototype_affinity_depth=4,
        pointnet_layers=((3, 3, 16),), pointnet_feature_depth=16,
        belief_sigma=1.0, affinity_radius=2.0,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_fpn_downsample_layers=2,
        anchor_scales=(12, 24, 48, 96, 192), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5,
        iou_neg_threshold=0.4, negative_example_ratio=3,
    )
    model = YoloPose(cfg)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), img0, train=False)
    rng = np.random.default_rng(2)
    frames = jnp.asarray(
        rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    )
    object_points = np.array(
        [[0.1, 0, 0], [0, 0.1, 0], [0, 0, 0.1], [0.1, 0.1, 0],
         [-0.1, 0, 0.05]], np.float32,
    )
    camera = np.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1.0]],
                      np.float32)
    return cfg, model, variables, frames, object_points, camera


@pytest.mark.slow
def test_split_pnp_matches_fused():
    cfg, model, variables, frames, obj, cam = _tiny()
    fused = make_yolo_pose_pipeline(
        model, cfg, object_points=obj, camera_matrix=cam, split_pnp=False
    )
    split = make_yolo_pose_pipeline(
        model, cfg, object_points=obj, camera_matrix=cam, split_pnp=True
    )
    a = fused(variables, frames)
    b = split(variables, frames)
    assert a.pose_valid is not None and b.pose_valid is not None
    np.testing.assert_array_equal(np.asarray(a.pose_valid),
                                  np.asarray(b.pose_valid))
    np.testing.assert_allclose(
        np.asarray(a.pose_translation), np.asarray(b.pose_translation),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(a.pose_rotation), np.asarray(b.pose_rotation),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(a.keypoint_y), np.asarray(b.keypoint_y), atol=1e-6
    )


def test_probe_env_override(monkeypatch):
    monkeypatch.setenv("TAUV_FUSED_PNP", "0")
    assert runtime_probe.fused_pnp_supported() is False
    monkeypatch.setenv("TAUV_FUSED_PNP", "1")
    assert runtime_probe.fused_pnp_supported() is True


def test_probe_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.delenv("TAUV_FUSED_PNP", raising=False)
    cache = tmp_path / "probe.json"
    monkeypatch.setattr(runtime_probe, "_cache_path", lambda: cache)
    calls = []

    def fake_probe(timeout):
        calls.append(1)
        return True

    monkeypatch.setattr(runtime_probe, "_run_probe", fake_probe)
    assert runtime_probe.fused_pnp_supported() is True
    assert runtime_probe.fused_pnp_supported() is True  # cached
    assert len(calls) == 1
    assert cache.exists()


def test_pipeline_auto_uses_probe(monkeypatch):
    """split_pnp='auto' must consult the probe (forced False here) and
    still produce poses via the split path."""
    monkeypatch.setenv("TAUV_FUSED_PNP", "0")
    cfg, model, variables, frames, obj, cam = _tiny()
    pipe = make_yolo_pose_pipeline(
        model, cfg, object_points=obj, camera_matrix=cam, split_pnp="auto"
    )
    out = pipe(variables, frames)
    assert out.pose_valid is not None
    assert out.pose_translation.shape == (2, 10, 3)
