"""End-to-end inference benchmark (the BASELINE.json metric).

Measures combined CenterNet+YOLACT throughput on 640x480 uint8 frames —
each frame runs through BOTH detector pipelines (fused preprocess +
forward + decode, bf16) — plus the p50 decode-only latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
North star: >= 1000 frames/sec/chip (vs_baseline = value / 1000).
"""

from __future__ import annotations

import json
import sys
import time
from math import pi

import numpy as np

BASELINE_FPS = 1000.0
BENCH_H, BENCH_W = 480, 640


def build_centernet(batch_size: int):
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.configs import (
        AngleConfig,
        CenternetModelConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centernet import Centernet
    from tauv_vision_tpu.serving.pipeline import make_centernet_pipeline

    object_config = ObjectConfigSet(
        configs=tuple(
            ObjectConfig(
                id=name,
                yaw=AngleConfig(train=False, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=2 * pi),
                roll=AngleConfig(train=False, modulo=2 * pi),
                train_depth=False,
                train_keypoints=False,
                keypoints=None,
            )
            for name in ("sample_24_coral", "sample_24_nautilus",
                         "torpedo_24", "torpedo_24_octagon")
        )
    )
    # Production config (centernet/configs/samples_torpedo.py): custom DLA,
    # 128ch x 5 tree levels, stride-4 output; 640x480 bench input.
    model_config = CenternetModelConfig(
        in_h=BENCH_H, in_w=BENCH_W,
        backbone_heights=(2, 2, 2, 2, 2),
        backbone_channels=(128, 128, 128, 128, 128, 128),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    model = Centernet(
        object_config=object_config,
        backbone_heights=model_config.backbone_heights,
        backbone_channels=model_config.backbone_channels,
        downsamples=model_config.downsamples,
        dtype=jnp.bfloat16,
    )
    img = jnp.zeros((1, BENCH_H, BENCH_W, 3), jnp.float32)
    variables = model.init(jax.random.key(0), img, train=False)
    pipeline = make_centernet_pipeline(
        model, model_config, n_detections=10, score_threshold=0.6,
    )
    return pipeline, variables, model, model_config


def build_yolact(batch_size: int):
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.configs import YolactModelConfig
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.serving.pipeline import make_yolact_pipeline

    # Production config (yolact/scripts/train.py:28-50) at 640x480.
    model_config = YolactModelConfig(
        in_w=BENCH_W, in_h=BENCH_H, feature_depth=256, n_classes=7,
        n_prototype_masks=8,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.4,
        iou_neg_threshold=0.3, negative_example_ratio=3,
    )
    model = Yolact(model_config, dtype=jnp.bfloat16)
    img = jnp.zeros((1, BENCH_H, BENCH_W, 3), jnp.float32)
    variables = model.init(jax.random.key(0), img, train=False)
    pipeline = make_yolact_pipeline(
        model, model_config, top_k=20, iou_threshold=0.5,
        confidence_threshold=0.5,
    )
    return pipeline, variables, model, model_config


def time_pipeline(pipeline, variables, frames, n_warmup=3, n_iters=10):
    import jax

    out = pipeline(variables, frames)
    jax.block_until_ready(out)
    for _ in range(n_warmup):
        jax.block_until_ready(pipeline(variables, frames))
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        jax.block_until_ready(pipeline(variables, frames))
        times.append(time.perf_counter() - t0)
    return times


def time_decode(model, variables, model_config, frames, family):
    """p50 latency of the decode stage alone."""
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.ops.image import preprocess
    from tauv_vision_tpu.serving.centernet_decode import decode as cn_decode
    from tauv_vision_tpu.serving.pipeline import IMAGENET_MEAN, IMAGENET_STDDEV
    from tauv_vision_tpu.serving.yolact_decode import decode_yolact

    img = preprocess(
        frames, (model_config.in_h, model_config.in_w),
        IMAGENET_MEAN, IMAGENET_STDDEV, dtype=jnp.bfloat16,
    )
    prediction = model.apply(variables, img, train=False)
    prediction = jax.block_until_ready(prediction)

    if family == "centernet":
        fn = jax.jit(
            lambda p: cn_decode(p, model_config, 10, 0.6)
        )
    else:
        fn = jax.jit(
            lambda p: decode_yolact(p, model_config, 20, 0.5, 0.5)
        )

    jax.block_until_ready(fn(prediction))
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(prediction))
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50))


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch_size, BENCH_H, BENCH_W, 3),
                          dtype=np.uint8)

    import jax
    import jax.numpy as jnp

    frames = jnp.asarray(frames)

    cn_pipeline, cn_vars, cn_model, cn_cfg = build_centernet(batch_size)
    yl_pipeline, yl_vars, yl_model, yl_cfg = build_yolact(batch_size)

    cn_times = time_pipeline(cn_pipeline, cn_vars, frames)
    yl_times = time_pipeline(yl_pipeline, yl_vars, frames)

    # Combined: every frame goes through both nets end-to-end.
    per_batch = np.median(cn_times) + np.median(yl_times)
    fps = batch_size / per_batch

    decode_p50 = time_decode(cn_model, cn_vars, cn_cfg, frames, "centernet")

    result = {
        "metric": "640x480 frames/sec/chip CenterNet+YOLACT inference",
        "value": round(float(fps), 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(float(fps) / BASELINE_FPS, 4),
        "detail": {
            "batch_size": batch_size,
            "centernet_fps": round(batch_size / float(np.median(cn_times)), 2),
            "yolact_fps": round(batch_size / float(np.median(yl_times)), 2),
            "decode_p50_ms": round(decode_p50 * 1e3, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
