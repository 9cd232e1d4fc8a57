"""End-to-end inference benchmark (the BASELINE.json metric).

Measures combined CenterNet+YOLACT throughput on 640x480 uint8 frames —
each frame runs through BOTH detector pipelines (fused preprocess +
forward + decode, bf16) — plus the p50 decode-only latency.

Timing methodology: this image's relay backend makes
``block_until_ready`` return before execution finishes and costs ~27 ms
per host fetch, so each measurement chains N pipeline invocations inside
one jitted ``lax.scan`` (serialized through a data dependency) and
fetches a scalar once; per-iteration time is the delta between N and 2N
chains, which cancels the fixed fetch overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
North star: >= 1000 frames/sec/chip (vs_baseline = value / 1000).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from math import pi

import numpy as np

BASELINE_FPS = 1000.0
BENCH_H, BENCH_W = 480, 640


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the remote compiler on this image
    is slow and queued, and bench graphs are large; caching makes repeat
    runs (driver, CI) start in seconds instead of tens of minutes."""
    import pathlib

    import jax

    cache = pathlib.Path(__file__).parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)



def build_centernet(deform: bool = True, dcn_impl: str = "pallas",
                    dcn_max_offset: float = 3, dcn_bound: bool = False,
                    early_pack: int = 0, up_impl: str = "dilated",
                    bn_bf16: bool = False, f32_stages: tuple = ()):
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.configs import (
        AngleConfig,
        CenternetModelConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
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
    # The deployed CenterNet is CenterpointDLA34 (centernet_node.py:46,
    # centernet/scripts/train.py:191) at its native 640x360 input; the
    # fused pipeline resizes the 640x480 camera frames on-device exactly
    # like the node does (centernet_node.py:90-92).
    model_config = CenternetModelConfig(
        in_h=360, in_w=640,
        backbone_heights=(2, 2, 2, 2, 2),
        backbone_channels=(128, 128, 128, 128, 128, 128),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    model = CenterpointDLA34(
        object_config=object_config, dtype=jnp.bfloat16, deform=deform,
        dcn_impl=dcn_impl, dcn_max_offset=dcn_max_offset,
        offset_bound=dcn_max_offset if dcn_bound else None,
        early_pack=early_pack, up_impl=up_impl,
        bn_out=jnp.bfloat16 if bn_bf16 else jnp.float32,
        f32_stages=tuple(f32_stages),
    )
    img = jnp.zeros((1, BENCH_H, BENCH_W, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, img, train=False))(
        jax.random.key(0)
    )
    pipeline = make_centernet_pipeline(
        model, model_config, n_detections=10, score_threshold=0.6,
    )
    raw = make_centernet_pipeline(
        model, model_config, n_detections=10, score_threshold=0.6, jit=False,
    )
    return pipeline, variables, model, model_config, raw


def build_yolact():
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.configs import YolactModelConfig
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.serving.pipeline import make_yolact_pipeline

    # Production config (yolact/scripts/train.py:28-50) at its native
    # 640x360; the pipeline resizes 640x480 frames on-device like the
    # node (yolact_node.py:106-114).
    model_config = YolactModelConfig(
        in_w=640, in_h=360, feature_depth=256, n_classes=7,
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
    variables = jax.jit(lambda k: model.init(k, img, train=False))(
        jax.random.key(0)
    )
    pipeline = make_yolact_pipeline(
        model, model_config, top_k=20, iou_threshold=0.5,
        confidence_threshold=0.5,
    )
    raw = make_yolact_pipeline(
        model, model_config, top_k=20, iou_threshold=0.5,
        confidence_threshold=0.5, jit=False,
    )
    return pipeline, variables, model, model_config, raw


def time_chained(pipeline, variables, frames, n_chain=6, n_reps=2,
                 tuned_options=False):
    """Median per-invocation seconds via N-vs-2N chained scans.

    ``tuned_options`` applies the serving compiler options
    (serving/compiler.py) to the outer jit — on for the bf16/north-star
    profiles where the sweep measured the win; the chain-int8 effect is
    settled by scripts/chain_options_ab.py before defaulting it on."""
    import functools

    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.serving.compiler import serving_compiler_options

    @functools.partial(
        jax.jit, static_argnums=2,
        compiler_options=serving_compiler_options()
        if tuned_options else None,
    )
    def chained(variables, frames, n):
        # Two traps this construction avoids (both observed as impossible
        # TFLOP/s): (1) the carry must be data-dependent or XLA hoists the
        # loop-invariant body; (2) EVERY output leaf must feed the carry
        # or XLA dead-code-eliminates entire branches (e.g. the whole
        # protonet, since detections' scores don't depend on it).
        def body(carry, _):
            out = pipeline(variables, frames + carry)
            total = sum(
                leaf.astype(jnp.float32).sum()
                for leaf in jax.tree_util.tree_leaves(out)
            )
            tiny = (total.astype(jnp.int32) % 2).astype(frames.dtype)
            return tiny, total
        _, totals = jax.lax.scan(
            body, jnp.zeros((), frames.dtype), None, length=n
        )
        return totals.sum()

    def run(n):
        float(chained(variables, frames, n))  # compile + warm
        times = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            float(chained(variables, frames, n))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t1 = run(n_chain)
    t2 = run(2 * n_chain)
    return max(t2 - t1, 1e-9) / n_chain


def time_decode(model, variables, model_config, frames, family, n_chain=16):
    """p50 decode-only latency via chained scans."""
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.ops.image import preprocess
    from tauv_vision_tpu.serving.centernet_decode import decode as cn_decode
    from tauv_vision_tpu.serving.pipeline import IMAGENET_MEAN, IMAGENET_STDDEV
    from tauv_vision_tpu.serving.yolact_decode import decode_yolact

    @jax.jit
    def forward(variables, frames):
        img = preprocess(
            frames, (model_config.in_h, model_config.in_w),
            IMAGENET_MEAN, IMAGENET_STDDEV, dtype=jnp.bfloat16,
        )
        return model.apply(variables, img, train=False)

    prediction = forward(variables, frames)

    if family == "centernet":
        decode_fn = lambda p: cn_decode(p, model_config, 10, 0.6)  # noqa: E731
    else:
        decode_fn = lambda p: decode_yolact(  # noqa: E731
            p, model_config, 20, 0.5, 0.5
        )

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def chained(p, n):
        def body(carry, _):
            shifted = jax.tree_util.tree_map(
                lambda a: a + carry.astype(a.dtype), p
            )
            out = decode_fn(shifted)
            total = sum(
                leaf.astype(jnp.float32).sum()
                for leaf in jax.tree_util.tree_leaves(out)
            )
            return total * 1e-12, total
        _, totals = jax.lax.scan(body, jnp.zeros(()), None, length=n)
        return totals.sum()

    def run(n):
        float(chained(prediction, n))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(prediction, n))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t1 = run(n_chain)
    t2 = run(2 * n_chain)
    return max(t2 - t1, 1e-9) / n_chain


def load_scales(raw_pipeline, variables, frames, cache_key,
                per_channel=False):
    """Calibration scales for the int8 paths, cached on disk: the bench
    models initialize from a fixed seed and calibrate on fixed frames,
    so the scales are deterministic and the eager pass (minutes over
    this image's relay) only needs to run once.  Per-channel scale
    vectors round-trip through JSON as lists."""
    import json
    import pathlib

    from tauv_vision_tpu.serving.quantize import calibrate

    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    suffix = "_pc" if per_channel else ""
    scales_path = cache_dir / f"calibration_{cache_key}{suffix}.json"
    if scales_path.exists():
        loaded = json.loads(scales_path.read_text())
        return {
            k: np.asarray(v) if isinstance(v, list) else v
            for k, v in loaded.items()
        }
    cal = frames[:2]
    scales = calibrate(lambda b: raw_pipeline(variables, b), [cal],
                       per_channel=per_channel)
    scales_path.write_text(json.dumps({
        k: (v.tolist() if hasattr(v, "tolist") else v)
        for k, v in scales.items()
    }))
    return scales


def load_scales_mse(raw_pipeline, variables, frames, cache_key, scales):
    """MSE-optimal per-channel clip refinement (serving/quantize.py
    refine_scales_mse), cached like the base scales — the grid search
    re-runs the eager calibration pass per candidate factor, so it is
    minutes over this image's relay and deterministic for fixed seed +
    frames."""
    import json
    import pathlib

    from tauv_vision_tpu.serving.quantize import refine_scales_mse

    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    mse_path = cache_dir / f"mse_{cache_key}.json"
    if mse_path.exists():
        loaded = json.loads(mse_path.read_text())
        return {
            k: np.asarray(v) if isinstance(v, list) else v
            for k, v in loaded.items()
        }
    refined = refine_scales_mse(
        lambda b: raw_pipeline(variables, b), [frames[:2]], scales
    )
    mse_path.write_text(json.dumps({
        k: (v.tolist() if hasattr(v, "tolist") else v)
        for k, v in refined.items()
    }))
    return refined


def load_corrections(raw_pipeline, variables, frames, cache_key, scales):
    """Bias corrections for the parity-int8 profile, cached like the
    scales (deterministic for fixed seed + frames)."""
    import json
    import pathlib

    from tauv_vision_tpu.serving.quantize import calibrate_bias_correction

    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    corr_path = cache_dir / f"biascorr_{cache_key}.json"
    if corr_path.exists():
        return {
            k: np.asarray(v)
            for k, v in json.loads(corr_path.read_text()).items()
        }
    corr = calibrate_bias_correction(
        lambda b: raw_pipeline(variables, b), [frames[:2]], scales
    )
    corr_path.write_text(
        json.dumps({k: v.tolist() for k, v in corr.items()})
    )
    return corr


def load_seq_corrections(build_forward, variables, frames, cache_key,
                         scales):
    """Sequential per-channel affine recalibration
    (quantize_chain.calibrate_sequential) for the parity-int8 profile,
    cached like the scales.  Returns (gains, corrections)."""
    import json
    import pathlib

    from tauv_vision_tpu.serving.quantize_chain import calibrate_sequential

    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    seq_path = cache_dir / f"seqcorr_{cache_key}.json"
    if seq_path.exists():
        loaded = json.loads(seq_path.read_text())
        return (
            {k: np.asarray(v) for k, v in loaded["gains"].items()},
            {k: np.asarray(v) for k, v in loaded["corrections"].items()},
        )
    gains, corr = calibrate_sequential(
        build_forward, variables, scales, frames[:4]
    )
    seq_path.write_text(json.dumps({
        "gains": {k: v.tolist() for k, v in gains.items()},
        "corrections": {k: v.tolist() for k, v in corr.items()},
    }))
    return gains, corr


def quantize_pipeline(raw_pipeline, variables, frames, cache_key):
    """Per-layer int8 pipeline (serving/quantize.py quantized_call);
    the default serving profile uses the faster chain-fused forwards
    (serving/quantize_chain.py) — this remains for --per-layer-int8."""
    import jax

    from tauv_vision_tpu.serving.quantize import quantized_call

    scales = load_scales(raw_pipeline, variables, frames, cache_key)
    return jax.jit(
        quantized_call(lambda b: raw_pipeline(variables, b), scales)
    ), len(scales)


def build_centernet_keypoints():
    """CenterNet in the node's FULL configuration: keypoint heatmaps +
    affinity + depth, greedy matcher + LM PnP fused on-device
    (centernet_node.py:106-116)."""
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.configs import (
        AngleConfig,
        CenternetModelConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
    from tauv_vision_tpu.serving.pipeline import (
        make_centernet_keypoint_pipeline,
    )

    keypoints = tuple(
        (0.1 * (i % 2) - 0.05, 0.1 * (i // 4) - 0.05, 0.02 * i)
        for i in range(8)
    )
    object_config = ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="torpedo_24",
                yaw=AngleConfig(train=False, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=2 * pi),
                roll=AngleConfig(train=False, modulo=2 * pi),
                train_depth=True, train_keypoints=True,
                keypoints=keypoints,
            ),
        )
    )
    model_config = CenternetModelConfig(
        in_h=360, in_w=640,
        backbone_heights=(2, 2, 2, 2, 2),
        backbone_channels=(128, 128, 128, 128, 128, 128),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    projection = [[520.0, 0, 320.0, 0], [0, 520.0, 180.0, 0], [0, 0, 1, 0]]
    model = CenterpointDLA34(
        object_config=object_config, dtype=jnp.bfloat16, deform=False
    )
    img = jnp.zeros((1, BENCH_H, BENCH_W, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, img, train=False))(
        jax.random.key(0)
    )
    make = lambda jit: make_centernet_keypoint_pipeline(  # noqa: E731
        model, model_config, object_config, projection,
        n_detections=10, keypoint_n_detections=50,
        score_threshold=0.6, keypoint_score_threshold=0.3, jit=jit,
    )
    extras = {"model_config": model_config, "object_config": object_config,
              "projection": projection}
    return make(True), make(False), variables, extras


def build_yolo_pose(with_pnp: bool = True):
    """YOLO-Pose at its training recipe resolution (960x480,
    yolo_pose/scripts/train.py:23-24) with belief-peak decode (+ PnP
    unless ``with_pnp=False`` — the fused graph with in-graph PnP
    intermittently crashes this image's TPU worker, see run_aux_bench)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig
    from tauv_vision_tpu.models.yolo_pose import YoloPose
    from tauv_vision_tpu.serving.pipeline import make_yolo_pose_pipeline

    # The reference training recipe's config
    # (yolo_pose/scripts/train.py:54-120).
    model_config = YoloPoseModelConfig(
        in_w=960, in_h=480, feature_depth=64, n_classes=21,
        n_prototype_masks=16,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        pointnet_layers=((7, 5, 64), (7, 5, 64)),
        pointnet_feature_depth=64,
        prototype_belief_depth=16, prototype_affinity_depth=16,
        belief_depth=9, affinity_depth=18,
        n_prediction_head_layers=1, n_fpn_downsample_layers=2,
        belief_sigma=2.0, affinity_radius=6.0,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5,
        iou_neg_threshold=0.4, negative_example_ratio=3,
    )
    model = YoloPose(model_config, dtype=jnp.bfloat16)
    img = jnp.zeros((1, model_config.in_h, model_config.in_w, 3),
                    jnp.float32)
    variables = jax.jit(lambda k: model.init(k, img, train=False))(
        jax.random.key(0)
    )
    object_points = np.array(
        [[0.1 * (i % 3) - 0.1, 0.1 * (i // 3) - 0.1, 0.05 * (i % 2)]
         for i in range(9)], np.float32,
    )
    camera = np.array(
        [[700.0, 0, 480.0], [0, 700.0, 240.0], [0, 0, 1.0]], np.float32
    )
    make = lambda jit: make_yolo_pose_pipeline(  # noqa: E731
        model, model_config, top_k=10, iou_threshold=0.5,
        confidence_threshold=0.5,
        object_points=object_points if with_pnp else None,
        camera_matrix=camera if with_pnp else None, jit=jit,
    )
    extras = {"model_config": model_config, "with_pnp": with_pnp,
              "object_points": object_points, "camera": camera}
    return make(True), make(False), variables, extras


def time_chained_dispatch(pipeline, variables, frames, n=6, n_reps=2):
    """Median per-invocation seconds via N-vs-2N SEQUENTIAL dispatches
    serialized through a data-dependent carry (each step's input adds
    the previous step's output parity).  Same cancellation as
    time_chained without wrapping the program in lax.scan — the
    YOLO-Pose fused graph (nested scan + vmapped 6x6 linalg.solve)
    reproducibly crashes the TPU worker when wrapped in an outer scan,
    while the identical program runs fine dispatched directly."""
    import functools

    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(variables, frames, carry):
        out = pipeline(variables, frames + carry)
        total = sum(
            leaf.astype(jnp.float32).sum()
            for leaf in jax.tree_util.tree_leaves(out)
        )
        return (total.astype(jnp.int32) % 2).astype(frames.dtype)

    def run(m):
        float(step(variables, frames, jnp.zeros((), frames.dtype)))
        times = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            carry = jnp.zeros((), frames.dtype)
            for _ in range(m):
                carry = step(variables, frames, carry)
            float(carry)  # forces the whole chain
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t1 = run(n)
    t2 = run(2 * n)
    return max(t2 - t1, 1e-9) / n


def run_host_io_bench(batch_size: int):
    """End-to-end throughput WITH host IO (VERDICT r2 item 6): frames
    come from disk, flow through ServingExecutor (upload / dispatch /
    download overlapped on three threads), and outputs are materialized
    to numpy — so the number includes everything the device-resident
    headline row excludes.

    Two sources are measured:
    - raw: a memory-mapped uint8 frame ring (the serving reality — the
      reference nodes receive raw camera frames, centernet_node.py:82);
    - png: the same frames PNG-encoded, decoded per batch through the
      native libpng codec (the dataset-on-disk reality).  NOTE this
      host has ONE core; PNG decode is codec-bound here and the row
      records the measured per-core codec rate alongside.
    """
    import pathlib
    import tempfile

    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.serving.executor import ServingExecutor

    rng = np.random.default_rng(0)
    n_batches = 8
    frames_all = rng.integers(
        0, 256, (n_batches * batch_size, BENCH_H, BENCH_W, 3),
        dtype=np.uint8,
    )

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="tauv_hostio_"))
    raw_path = tmp / "frames.npy"
    np.save(raw_path, frames_all)

    from tauv_vision_tpu.data.image_io import write_png

    png_dir = tmp / "png"
    png_dir.mkdir()
    t0 = time.perf_counter()
    for i in range(n_batches * batch_size):
        write_png(png_dir / f"{i:06d}.png", frames_all[i])
    print(f"wrote {n_batches * batch_size} pngs in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    # The headline serving profile: chain-int8, both detectors.
    frames0 = jnp.asarray(frames_all[:batch_size])
    cn_pipeline, cn_vars, cn_model, cn_cfg, cn_raw = build_centernet(
        deform=False
    )
    yl_pipeline, yl_vars, yl_model, yl_cfg, yl_raw = build_yolact()
    from tauv_vision_tpu.serving.quantize_chain import (
        make_centernet_chain_pipeline,
        make_yolact_chain_pipeline,
    )

    print("models built; calibrating...", file=sys.stderr, flush=True)
    cn_scales = load_scales(cn_raw, cn_vars, frames0,
                            f"centernet_b{batch_size}")
    yl_scales = load_scales(yl_raw, yl_vars, frames0,
                            f"yolact_b{batch_size}")
    cn_q = make_centernet_chain_pipeline(
        cn_cfg, cn_model.object_config, cn_vars, cn_scales,
        n_detections=10, score_threshold=0.6,
    )
    yl_q = make_yolact_chain_pipeline(
        yl_cfg, yl_vars, yl_scales, top_k=20, iou_threshold=0.5,
        confidence_threshold=0.5,
    )

    from tauv_vision_tpu.serving.compiler import serving_jit

    @serving_jit
    def combined(variables, frames):
        cn_out, yl_out = cn_q(frames), yl_q(frames)
        # Materialize the payload the reference node actually publishes:
        # mask BITMAPS (yolact_node.py binarizes masks into the
        # detection message), not proto-res f32 maps.  packbits on
        # device cuts the downloaded mask payload 32x (147 MB -> 4.6 MB
        # per batch-128) — essential through this image's tunnel, whose
        # device->host path measured 1.0 MB/s on round-3 re-measure
        # (78 MB/s in round 2; it drifts), and representative of real
        # serving where outputs cross PCIe once as compact messages.
        yl_out = dataclasses.replace(
            yl_out, mask=jnp.packbits(yl_out.mask > 0.5, axis=-1)
        )
        return cn_out, yl_out

    print("compiling fused graph...", file=sys.stderr, flush=True)
    executor = ServingExecutor(combined, {}, prefetch=2)

    def raw_source(reps):
        mm = np.load(raw_path, mmap_mode="r")
        for _ in range(reps):
            for i in range(n_batches):
                yield np.asarray(mm[i * batch_size:(i + 1) * batch_size])

    def png_source(reps):
        from tauv_vision_tpu.data.image_io import read_image

        names = sorted(png_dir.iterdir())
        for _ in range(reps):
            for i in range(n_batches):
                batch = names[i * batch_size:(i + 1) * batch_size]
                yield np.stack([read_image(p) for p in batch])

    def measure(source, reps):
        # warm (compile + caches)
        for _ in executor.run(source(1)):
            pass
        t0 = time.perf_counter()
        n = 0
        for _ in executor.run(source(reps)):
            n += batch_size
        dt = time.perf_counter() - t0
        return n / dt

    print("measuring raw-frame host IO...", file=sys.stderr)
    raw_fps = measure(raw_source, 4)
    print("measuring png host IO...", file=sys.stderr)
    png_fps = measure(png_source, 1)

    # Pure codec rate on this host (1 core): the ceiling of the png row.
    from tauv_vision_tpu.data.image_io import read_image

    names = sorted(png_dir.iterdir())[:128]
    t0 = time.perf_counter()
    for p in names:
        read_image(p)
    codec_fps = len(names) / (time.perf_counter() - t0)

    result = {
        "metric": "640x480 frames/sec/chip CenterNet+YOLACT inference "
                  "with host IO",
        "value": round(raw_fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(raw_fps / BASELINE_FPS, 4),
        "detail": {
            "batch_size": batch_size,
            "int8_mode": "chain",
            "raw_frames_fps": round(raw_fps, 2),
            "png_frames_fps": round(png_fps, 2),
            "png_codec_only_fps_per_core": round(codec_fps, 2),
            "host_cores": os.cpu_count(),
            "outputs_materialized": True,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def run_train_io_bench(batch_size: int = 32, steps: int = 12):
    """Training-side host IO (VERDICT r2 item 6): can the host loader
    feed the DLA-34 train step from an on-disk dataset without starving
    it?  Writes a synthetic square dataset in the canonical dataset-dir
    layout (PNG + JSON), then times train steps fed by
    data/loader.BatchLoader + PoseDataset vs the same steps on a
    device-resident batch; the gap is the un-overlapped host cost."""
    import pathlib
    import tempfile
    from math import pi as _pi

    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.configs import (
        AngleConfig,
        CenternetModelConfig,
        CenternetTrainConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.data.dataset_dir import (
        DatasetSample,
        Split,
        write_classes,
        write_meta,
        write_sample,
        write_splits,
    )
    from tauv_vision_tpu.data.loader import BatchLoader
    from tauv_vision_tpu.data.pose_dataset import (
        PoseDataset,
        collate_pose_samples,
    )
    from tauv_vision_tpu.data.synthetic import (
        SquareDatasetConfig,
        generate_square_batch,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
    from tauv_vision_tpu.train import (
        TrainState,
        adam_with_clip,
        make_centernet_train_step,
    )

    in_h, in_w = 360, 640
    n_samples = 4 * batch_size
    root = pathlib.Path(tempfile.mkdtemp(prefix="tauv_trainio_"))
    data = root / "data"
    rng = np.random.default_rng(3)
    sq = SquareDatasetConfig(in_h=in_h, in_w=in_w, max_objects=4,
                             min_side=24, max_side=96, rotate=False)
    projection = [[520.0, 0, in_w / 2, 0], [0, 520.0, in_h / 2, 0],
                  [0, 0, 1, 0]]
    ids = []
    print(f"writing {n_samples}-sample dataset...", file=sys.stderr)
    for i in range(n_samples):
        img, truth = generate_square_batch(rng, 1, sq)
        objects = []
        for j in range(truth.valid.shape[1]):
            if not truth.valid[0, j]:
                continue
            cy, cx = truth.center[0, j]
            h, w = truth.size[0, j]
            objects.append({
                "label": "square", "class_id": "square",
                "bbox": {"x": float(cx), "y": float(cy),
                         "w": float(w), "h": float(h)},
                "pose": {
                    "roll": 0.0, "pitch": 0.0, "yaw": 0.0,
                    "distance": 2.0,
                    "cam_t_object": [1, 0, 0, 0, 0, 1, 0, 0,
                                     0, 0, 1, 2, 0, 0, 0, 1],
                },
            })
        id = f"{i:06d}"
        ids.append(id)
        write_sample(data, DatasetSample(
            id=id, img=(np.clip(img[0], 0, 1) * 255).astype(np.uint8),
            seg=None, objects=objects,
            camera={"h": in_h, "w": in_w, "projection": projection},
        ))
    write_splits(root, {"train": ids, "val": [], "test": []})
    write_classes(root, ["square"])
    write_meta(root, "bench", "train-io bench", "2026-01-01T00:00:00")

    object_config = ObjectConfigSet(configs=(
        ObjectConfig(
            id="square",
            yaw=AngleConfig(train=False, modulo=2 * _pi),
            pitch=AngleConfig(train=False, modulo=2 * _pi),
            roll=AngleConfig(train=False, modulo=2 * _pi),
            train_depth=False, train_keypoints=False, keypoints=None,
        ),
    ))
    model_config = CenternetModelConfig(
        in_h=in_h, in_w=in_w, backbone_heights=(2, 2, 2, 2, 2),
        backbone_channels=(128,) * 6, downsamples=2,
        angle_bin_overlap=_pi / 3,
    )
    train_config = CenternetTrainConfig(
        lr=1e-3, batch_size=batch_size, n_batches=0, n_epochs=1,
        heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
        heatmap_sigma_factor=0.1, keypoint_heatmap_sigma=2.0,
        keypoint_affinity_sigma=2.0, loss_lambda_keypoint_heatmap=1.0,
        loss_lambda_keypoint_affinity=1.0, loss_lambda_size=0.1,
        loss_lambda_offset=1.0, loss_lambda_angle=1.0,
        loss_lambda_depth=1.0, max_objects=4, max_keypoints=4,
    )
    model = CenterpointDLA34(object_config=object_config,
                             dtype=jnp.bfloat16, deform=False)
    img0 = jnp.zeros((1, in_h, in_w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, img0, train=False))(
        jax.random.key(0)
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(1e-3, 1.0),
    )
    step_fn = make_centernet_train_step(
        model, model_config, train_config, object_config
    )

    dataset = PoseDataset(root, Split.TRAIN,
                          object_config.label_id_to_index, object_config,
                          transform=None)

    def collate(samples):
        return collate_pose_samples(samples, max_objects=4, max_keypoints=4)

    loader = BatchLoader(dataset, batch_size, collate, n_workers=2)

    def loader_batches():
        while True:
            for batch in loader:
                yield batch

    batches = loader_batches()

    # Device-resident reference: one batch re-stepped.
    img_d, truth_d = next(batches)
    img_d = jnp.asarray(img_d)
    truth_d = jax.tree_util.tree_map(jnp.asarray, truth_d)

    def time_steps(get_batch, n):
        nonlocal state
        # warm: 1 step (compile)
        img, truth = get_batch()
        state, losses = step_fn(state, img, truth)
        float(losses.total)
        t0 = time.perf_counter()
        for _ in range(n):
            img, truth = get_batch()
            state, losses = step_fn(state, img, truth)
        float(losses.total)
        return (time.perf_counter() - t0) / n

    print("timing device-resident steps...", file=sys.stderr)
    t_resident = time_steps(lambda: (img_d, truth_d), steps)

    def from_loader():
        img, truth = next(batches)
        return jnp.asarray(img), jax.tree_util.tree_map(jnp.asarray, truth)

    print("timing loader-fed steps...", file=sys.stderr)
    t_loader = time_steps(from_loader, steps)

    # Tunnel-independent supply rate: the loader's pure host-side
    # production (PNG decode + collate, no device), the number that
    # answers "can the host feed the step?" on hardware where
    # host->device is PCIe, not this image's ~11 MB/s tunnel.
    print("timing loader host-side supply...", file=sys.stderr)
    next(batches)  # ensure prefetch queues are in steady state
    t0 = time.perf_counter()
    for _ in range(steps):
        next(batches)
    t_supply = (time.perf_counter() - t0) / steps

    result = {
        "metric": "DLA-34 train step with host input pipeline",
        "value": round(t_loader * 1e3, 1),
        "unit": "ms/step",
        "detail": {
            "batch_size": batch_size,
            "resident_ms_per_step": round(t_resident * 1e3, 1),
            "loader_ms_per_step": round(t_loader * 1e3, 1),
            "loader_overhead_pct": round(
                100 * (t_loader - t_resident) / t_resident, 1
            ),
            "img_per_sec": round(batch_size / t_loader, 1),
            "loader_supply_ms_per_batch": round(t_supply * 1e3, 1),
            "loader_supply_img_per_sec": round(batch_size / t_supply, 1),
            "n_loader_workers": 2,
            "host_cores": os.cpu_count(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def run_train_bench(family: str, batch_size: int = 0, steps: int = 10):
    """Train-step timing for each family at its production recipe
    (VERDICT r2 item 8): one number per family so training-performance
    claims cover all three.  Reference recipes: CenterNet batch 32 @
    640x360 (samples_torpedo.py:19), YOLACT batch 24 @ 640x360
    (yolact/scripts/train.py:57), YOLO-Pose batch 4 @ 960x480
    (yolo_pose/scripts/train.py:60)."""
    from math import pi as _pi

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    if family == "centernet":
        from tauv_vision_tpu.configs import (
            AngleConfig,
            CenternetModelConfig,
            CenternetTrainConfig,
            ObjectConfig,
            ObjectConfigSet,
        )
        from tauv_vision_tpu.data.synthetic import (
            SquareDatasetConfig,
            generate_square_batch,
        )
        from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
        from tauv_vision_tpu.train import (
            TrainState,
            adam_with_clip,
            make_centernet_train_step,
        )

        batch_size = batch_size or 32
        oc = ObjectConfigSet(configs=(
            ObjectConfig(
                id="square", yaw=AngleConfig(train=False, modulo=2 * _pi),
                pitch=AngleConfig(train=False, modulo=2 * _pi),
                roll=AngleConfig(train=False, modulo=2 * _pi),
                train_depth=False, train_keypoints=False, keypoints=None,
            ),
        ))
        mc = CenternetModelConfig(
            in_h=360, in_w=640, backbone_heights=(2, 2, 2, 2, 2),
            backbone_channels=(128,) * 6, downsamples=2,
            angle_bin_overlap=_pi / 3,
        )
        tc = CenternetTrainConfig(
            lr=1e-4, batch_size=batch_size, n_batches=0, n_epochs=1,
            heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
            heatmap_sigma_factor=0.1, keypoint_heatmap_sigma=2.0,
            keypoint_affinity_sigma=2.0, loss_lambda_keypoint_heatmap=1.0,
            loss_lambda_keypoint_affinity=1.0, loss_lambda_size=0.1,
            loss_lambda_offset=1.0, loss_lambda_angle=1.0,
            loss_lambda_depth=1.0, max_objects=4, max_keypoints=4,
        )
        model = CenterpointDLA34(object_config=oc, dtype=jnp.bfloat16,
                                 deform=False)
        img_np, truth = generate_square_batch(
            rng, batch_size,
            SquareDatasetConfig(in_h=360, in_w=640, max_objects=4,
                                min_side=24, max_side=96, rotate=False),
        )
        img = jnp.asarray(img_np)
        truth = jax.tree_util.tree_map(jnp.asarray, truth)
        variables = jax.jit(
            lambda k: model.init(k, img[:1], train=False)
        )(jax.random.key(0))
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=adam_with_clip(tc.lr, 1.0),
        )
        step_fn = make_centernet_train_step(model, mc, tc, oc)
    elif family == "yolact":
        from tauv_vision_tpu.configs import (
            YolactModelConfig,
            YolactTrainConfig,
        )
        from tauv_vision_tpu.data.synthetic import (
            SquareDatasetConfig,
            generate_square_seg_batch,
        )
        from tauv_vision_tpu.models.yolact import Yolact
        from tauv_vision_tpu.train import (
            TrainState,
            YolactTruth,
            adam_with_clip,
            make_yolact_train_step,
        )

        batch_size = batch_size or 24
        mc = YolactModelConfig(
            in_w=640, in_h=360, feature_depth=256, n_classes=7,
            n_prototype_masks=8,
            n_masknet_layers_pre_upsample=1,
            n_masknet_layers_post_upsample=1,
            n_prediction_head_layers=1, n_classification_layers=0,
            n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
            anchor_scales=(24, 48, 96, 192, 384),
            anchor_aspect_ratios=(1.0,),
            box_variances=(0.1, 0.2), iou_pos_threshold=0.4,
            iou_neg_threshold=0.3, negative_example_ratio=3,
        )
        tc = YolactTrainConfig(
            lr=1e-3, momentum=0.9, weight_decay=0.0, grad_max_norm=1.0,
            n_epochs=1, batch_size=batch_size, epoch_n_batches=1,
            max_objects=4,
        )
        model = Yolact(mc, dtype=jnp.bfloat16)
        img_np, fields = generate_square_seg_batch(
            rng, batch_size,
            SquareDatasetConfig(in_h=360, in_w=640, max_objects=4,
                                min_side=24, max_side=96, rotate=False),
        )
        img = jnp.asarray(img_np)
        truth = YolactTruth(
            valid=jnp.asarray(fields["valid"]),
            classification=jnp.asarray(fields["classification"]),
            box=jnp.asarray(fields["box"]),
            seg_map=jnp.asarray(fields["seg"].astype(np.int32)),
            img_valid=jnp.asarray(fields["img_valid"]),
        )
        variables = jax.jit(
            lambda k: model.init(k, img[:1], train=False)
        )(jax.random.key(0))
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=adam_with_clip(tc.lr, 1.0),
        )
        step_fn = make_yolact_train_step(model, mc, tc)
    else:  # yolo_pose
        from tauv_vision_tpu.train.yolo_pose_task import (
            YoloPoseTruth,
            yolo_pose_loss,
        )
        from tauv_vision_tpu.train import TrainState, adam_with_clip

        batch_size = batch_size or 4
        _, raw, variables, extras = build_yolo_pose(with_pnp=False)
        mc = extras["model_config"]
        from tauv_vision_tpu.models.yolo_pose import YoloPose

        model = YoloPose(mc, dtype=jnp.bfloat16)
        img = jnp.asarray(
            rng.uniform(0, 1, (batch_size, mc.in_h, mc.in_w, 3))
            .astype(np.float32)
        )
        m = 2
        th, tw = mc.in_h // 16, mc.in_w // 16  # pointnet target res
        truth = YoloPoseTruth(
            valid=jnp.ones((batch_size, m), bool),
            classification=jnp.ones((batch_size, m), jnp.int32),
            box=jnp.tile(
                jnp.asarray([[0.4, 0.4, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]])
                [None], (batch_size, 1, 1),
            ),
            seg_map=jnp.full((batch_size, mc.in_h, mc.in_w), 255,
                             jnp.int32).at[:, 100:200, 300:500].set(0),
            keypoints=jnp.asarray(
                rng.uniform(0, min(th, tw),
                            (batch_size, m, mc.belief_depth, 2))
                .astype(np.float32)
            ),
            keypoint_valid=jnp.ones(
                (batch_size, m, mc.belief_depth), bool
            ),
            centers=jnp.asarray(
                rng.uniform(0, min(th, tw), (batch_size, m, 2))
                .astype(np.float32)
            ),
        )
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=adam_with_clip(1e-4, 1.0),
        )

        @jax.jit
        def step_fn(state, img, truth):
            def loss_fn(params, stats):
                vs = {"params": params}
                if stats is not None:
                    vs["batch_stats"] = stats
                pred, mutated = model.apply(
                    vs, img, train=True, mutable=["batch_stats"]
                )
                losses = yolo_pose_loss(pred, truth, mc)
                return losses.total, (losses, mutated.get("batch_stats"))

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (losses, new_stats)), grads = grad_fn(
                state.params, state.batch_stats
            )
            state = state.apply_gradients(grads=grads)
            if new_stats is not None:
                state = state.replace(batch_stats=new_stats)
            return state, losses

    # warm (compile) then time `steps` steps, forcing completion via the
    # scalar fetch (small; the ~27 ms relay fetch amortizes over steps).
    state, losses = step_fn(state, img, truth)
    float(losses.total)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, losses = step_fn(state, img, truth)
    float(losses.total)
    per_step = (time.perf_counter() - t0) / steps

    result = {
        "metric": f"{family} train step",
        "value": round(per_step * 1e3, 1),
        "unit": "ms/step",
        "detail": {
            "batch_size": batch_size,
            "img_per_sec": round(batch_size / per_step, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def run_aux_bench(family: str, batch_size: int):
    """Bench the keypoint+PnP or YOLO-Pose serving path, bf16 and int8
    (VERDICT r1 item 9).  Prints one JSON line and exits."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (batch_size, BENCH_H, BENCH_W, 3),
                     dtype=np.uint8)
    )
    if family == "keypoints":
        pipeline, raw, variables, extras = build_centernet_keypoints()
        timer = time_chained
    else:
        # The fused YOLO-Pose graph WITH in-graph PnP intermittently
        # crashes this image's TPU worker (kernel fault; reproduced with
        # and without lax.scan wrapping, with and without
        # jnp.linalg.solve).  PnP itself runs fine as its own jit
        # (tests/test_se3_pnp.py; bisected on-chip), so the bench times
        # the belief-peak pipeline and PnP stays a separate dispatch in
        # serving until the runtime fault is resolved.
        pipeline, raw, variables, extras = build_yolo_pose(with_pnp=False)
        timer = time_chained_dispatch  # see its docstring

    t_bf16 = timer(pipeline, variables, frames, 3)

    # Chain-fused int8 (the default serving profile, like the headline
    # bench); --per-layer-int8 selects the interceptor path instead.
    per_layer = "--per-layer-int8" in sys.argv
    scales = load_scales(raw, variables, frames, f"{family}_b{batch_size}")
    if per_layer:
        q, n_q = quantize_pipeline(
            raw, variables, frames, f"{family}_b{batch_size}"
        )
    elif family == "keypoints":
        from tauv_vision_tpu.serving.quantize_chain import (
            make_centernet_keypoint_chain_pipeline,
        )

        q = make_centernet_keypoint_chain_pipeline(
            extras["model_config"], extras["object_config"], variables,
            scales, extras["projection"], n_detections=10,
            keypoint_n_detections=50, score_threshold=0.6,
            keypoint_score_threshold=0.3,
        )
        n_q = len(scales)
    else:
        from tauv_vision_tpu.serving.quantize_chain import (
            make_yolo_pose_chain_pipeline,
        )

        q = make_yolo_pose_chain_pipeline(
            extras["model_config"], variables, scales, top_k=10,
            iou_threshold=0.5, confidence_threshold=0.5,
            object_points=(
                extras["object_points"] if extras["with_pnp"] else None
            ),
            camera_matrix=extras["camera"] if extras["with_pnp"] else None,
        )
        n_q = len(scales)
    t_int8 = timer(lambda v, f: q(f), variables, frames, 3)

    result = {
        "metric": f"640x480 frames/sec/chip {family} pipeline",
        "value": round(batch_size / t_int8, 2),
        "unit": "frames/sec/chip",
        "detail": {
            "batch_size": batch_size,
            "bf16_fps": round(batch_size / t_bf16, 2),
            "int8_fps": round(batch_size / t_int8, 2),
            "int8_mode": "per-layer" if per_layer else "chain",
            "quantized_convs": n_q,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def main():
    _enable_compilation_cache()
    if "--keypoints" in sys.argv or "--yolo-pose" in sys.argv:
        family = "keypoints" if "--keypoints" in sys.argv else "yolo_pose"
        batch = next(
            (int(a) for a in sys.argv[1:] if a.isdigit()), 16
        )
        run_aux_bench(family, batch)
        return
    batch_size = next(
        (int(a) for a in sys.argv[1:] if a.isdigit()), 128
    )
    if "--host-io" in sys.argv:
        run_host_io_bench(batch_size)
        return
    if "--train-io" in sys.argv:
        run_train_io_bench(
            next((int(a) for a in sys.argv[1:] if a.isdigit()), 32)
        )
        return
    if "--train-step" in sys.argv:
        family = sys.argv[sys.argv.index("--train-step") + 1]
        run_train_bench(
            family, next((int(a) for a in sys.argv[1:] if a.isdigit()), 0)
        )
        return
    # Default: the deployable configuration (plain-conv IDA, the custom
    # backbone's aggregation style and SURVEY §7's accuracy-checked
    # fallback).  The DCN path serves with --deform through the Pallas
    # kernel (ops/pallas/deform_conv.py, 184 fps combined at R=1 vs 38
    # for the round-1 XLA shift formulation); see BENCH.md.
    deform = "--deform" in sys.argv
    # --dcn-impl {pallas,shift,gather}: deformable implementation for the
    # --deform path.  Default pallas (ops/pallas/deform_conv.py).
    dcn_impl = "pallas"
    if "--dcn-impl" in sys.argv:
        dcn_impl = sys.argv[sys.argv.index("--dcn-impl") + 1]
    # --dcn-max-offset R: shift-window radius.  R=3 is the
    # exactness-tested default; smaller R serves faster (VPU work and
    # kernel size scale with (2R+2)^2) at the cost of clamping rarer
    # large offsets.
    dcn_max_offset = 3.0
    if "--dcn-max-offset" in sys.argv:
        dcn_max_offset = float(
            sys.argv[sys.argv.index("--dcn-max-offset") + 1]
        )
    # --dcn-bound: bounded-offset DCNv2 (offset_bound == max_offset, so
    # the Pallas shift-window kernel is exact by construction; fractional
    # radii shrink the per-tap shift window — r=0.5 needs 3x3 instead of
    # r=1's 4x4).
    dcn_bound = "--dcn-bound" in sys.argv
    # --early-pack G: batch-group channel packing for the DLA-34 early
    # trunk (stem/level0/level1 computed G images per conv via
    # block-diagonal kernels; models/centerpoint_dla._PackedConv).
    # Numerically the unpacked forward up to conv accumulation order;
    # measured win: scripts/early_pack_probe.py.
    early_pack = 0
    if "--early-pack" in sys.argv:
        early_pack = int(sys.argv[sys.argv.index("--early-pack") + 1])
    # --up-impl {dilated,block}: depthwise-upsample lowering for the
    # DLAUp/IDAUp aggregation stage.  "block" is the zero-free
    # block-phase sum (ops/conv_transpose.depthwise_upsample_block);
    # chip verdict: scripts/upsample_ab_probe.py.
    up_impl = "dilated"
    if "--up-impl" in sys.argv:
        up_impl = sys.argv[sys.argv.index("--up-impl") + 1]

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch_size, BENCH_H, BENCH_W, 3),
                          dtype=np.uint8)

    import jax
    import jax.numpy as jnp

    frames = jnp.asarray(frames)

    # --bn-bf16: CenterNet flax model with BatchNorm outputs rounded to
    # bf16 (models/centerpoint_dla._bn) — the BN math stays f32, only
    # the materialized maps shrink.  Decoded-delta certification:
    # quantize_accuracy_check 'flax-bf16-bn16' rung.  The north-star
    # profile serves this variant by default (interleaved A/B: 1.040x
    # whole-CN, bn_ab_probe); --exact-flow restores the f32 join flow.
    exact_flow = "--exact-flow" in sys.argv
    # Explicit profile selection (ADVICE r4): exactly one of the profile
    # flags may be passed; conflicts error instead of silently winning by
    # exclusion.  No flag = the north-star default (round 4), except
    # --deform, which serves the chain profile (int8 trunk + bf16
    # bounded-DCN IDA stages).
    _profile_flags = [
        f for f in ("--north-star", "--chain-int8", "--per-layer-int8",
                    "--bf16", "--parity-int8")
        if f in sys.argv
    ]
    if len(_profile_flags) > 1:
        raise SystemExit(
            f"conflicting profile flags: {' '.join(_profile_flags)}; "
            "pass at most one"
        )
    if _profile_flags:
        profile = _profile_flags[0].lstrip("-")
    elif deform:
        profile = "chain-int8"
    else:
        profile = "north-star"
    is_north_star = profile == "north-star"
    bn_bf16 = "--bn-bf16" in sys.argv or (is_north_star and not exact_flow)
    # --f32-from S1,S2,...: CN stages forced to full f32 (conv compute +
    # BN outputs) — the f32-from-level-K serving ladder's knob
    # (scripts/cn_f32_ladder.py; stages from {early, level2..level5,
    # dla_up, ida_up, heads}).  The north-star profile serves an f32
    # STEM by default (round 5): the 7x7 C_in=3 stem is 0.2% of CN
    # FLOPs and HBM-bound, and computing it in f32 removes the
    # uint8->bf16 input-rounding that dominated the decoded score delta
    # (score p95 2.82e-3 -> 9.0e-4, center 7.5e-5 -> 3.8e-5, fps within
    # noise — PARITY.md round 5, BENCH.md ladder 2).  --exact-flow
    # restores the round-4 flax-exact flow (bf16 stem, f32 joins); an
    # explicit --f32-from overrides the default.
    f32_stages = ("stem",) if (is_north_star and not exact_flow) else ()
    if "--f32-from" in sys.argv:
        f32_stages = tuple(
            sys.argv[sys.argv.index("--f32-from") + 1].split(",")
        )
        known_stages = {"early", "stem", "level0", "level1", "level2",
                        "level3", "level4", "level5", "dla_up", "ida_up",
                        "heads"}
        bad = [s for s in f32_stages if s not in known_stages]
        if bad:
            raise SystemExit(f"unknown --f32-from stage(s) {bad}; "
                             f"known: {sorted(known_stages)}")
    cn_pipeline, cn_vars, cn_model, cn_cfg, cn_raw = build_centernet(
        deform=deform, dcn_impl=dcn_impl, dcn_max_offset=dcn_max_offset,
        dcn_bound=dcn_bound, early_pack=early_pack, up_impl=up_impl,
        bn_bf16=bn_bf16, f32_stages=f32_stages,
    )
    yl_pipeline, yl_vars, yl_model, yl_cfg, yl_raw = build_yolact()

    # Default serving profile: chain-fused int8 PTQ
    # (serving/quantize_chain.py) — activations stay int8 across conv
    # links, BN folded into the requant epilogue.  --per-layer-int8
    # selects the interceptor-based per-layer path (serving/quantize.py);
    # --bf16 the exact-parity float path (the one the 1e-3
    # reference-parity tests cover).  Round 4: the chain path covers
    # --deform too (int8 trunk + bf16 bounded-DCN IDA stages).
    int8 = profile != "bf16"
    # --parity-int8: the decoded-parity serving profile — per-channel
    # activation scales folded into the weights, per-output-channel bias
    # correction, and a bf16 tail (--bf16-tail substrings, default the
    # output heads) so the convs that shape the decoded outputs run
    # float.  Same chain machinery; fps differs from plain chain only by
    # the tail's bf16 convs.  Decoded-delta evidence:
    # scripts/quantize_accuracy_check.py --sweep (BENCH.md table).
    parity = profile == "parity-int8"
    # --north-star: the configuration claiming BOTH halves of
    # BASELINE.json's target in one graph.  CenterNet runs the certified
    # float serving path (bf16 — the path the 1e-3 reference-parity
    # suite covers; decoded deltas vs it are exactly 0), YOLACT runs
    # chain-int8 with the decode-facing tail bf16 (the
    # yolact_parity_check rung where every decoded delta lands <=1e-3
    # at p95 over 512 images: score 2.8e-4, center 2.4e-4, size 4.7e-4,
    # mask IoU 0.996), and both nets + decodes fuse into ONE jitted
    # graph sharing the 480->360 resize (make_combined_pipeline,
    # bit-identical outputs to the separate dispatches).
    north_star = "--north-star" in sys.argv
    # Round 4: the north-star configuration is the DEFAULT profile —
    # it is the config that satisfies BOTH halves of the target at once
    # (median 1026.5 fps over 3 runs: 1031.28/1026.15/1026.47, with the
    # decoded-parity certification tables in PARITY.md), so the driver's
    # no-args run records it.  The throughput-max chain-int8 profile
    # (1124 fps, CN size p95 1.3e-3 — fails the parity bar) stays
    # reachable via --chain-int8.
    north_star = north_star or is_north_star
    # Round 4 measured and KILLED the planned --north-star-v2 variant
    # (CN chain float + int8 IDA/DLAup aggregation + f32 heads): on 512
    # images vs the bf16 float path even the cheapest CN int8 rung
    # (dlaup-int8, 12 convs) fails the size bar (p95 1.65e-3), and f32
    # heads move nothing (the bf16-vs-f32 drift is trunk feature noise,
    # not head rounding — quantize_accuracy_check tenth ladder,
    # BENCH.md round-4 section).  CenterNet therefore stays all-bf16 in
    # the north-star config; there is no v2.
    if north_star:
        parity = True
    # Default tail = the winning sweep rung (quantize_accuracy_check
    # --sweep): heads + the MXU-starved 16/32-ch early trunk levels +
    # the IDA/DLA aggregation convs stay bf16; the bulk-FLOP mid/late
    # trunk levels and all of YOLACT's backbone/FPN/protonet stay int8.
    bf16_tail = ("head_", "level0_", "level1_", "ida_up", "dla_up")
    if "--bf16-tail" in sys.argv:
        bf16_tail = tuple(
            sys.argv[sys.argv.index("--bf16-tail") + 1].split(",")
        )
    # Bias correction is opt-in for the parity profile: the sweep
    # measured it HURTING decoded agreement at serving calibration
    # sizes (the correction itself is estimated from few batches).
    bias_correct = "--bias-correct" in sys.argv
    # --mse: MSE-optimal per-channel clip refinement on top of the
    # per-channel scales (the final precision lever from the sweep).
    mse = "--mse" in sys.argv
    # --seq-correct: sequential per-channel affine recalibration
    # (quantize_chain.calibrate_sequential) — fits each int8 conv's
    # epilogue (gain, offset) against the float chain with upstream
    # quantization error included.  Folds into the existing epilogue
    # multiply-add, so it costs no serving time.
    seq_correct = "--seq-correct" in sys.argv
    # --int8-transpose {phase-xla,pallas,xla,off}: lowering for the
    # YOLACT protonet k3s2 transposed convs in the chain profiles.
    # "phase-xla" = four exact-tap XLA int8 convs + per-phase fused
    # epilogues + one int8 interleave (bit-equal to the lhs-dilated
    # int8 sim; no Mosaic dependency); "pallas" = the VMEM phase-GEMM
    # kernel (measured 26 ms vs bf16's 11.4 at up2 — kept for study);
    # default "off" keeps the bf16 dilated lowering until the chip A/B
    # and the mask-parity rung land (transpose_kernel_probe.py).
    int8_transpose = None
    if "--int8-transpose" in sys.argv:
        v = sys.argv[sys.argv.index("--int8-transpose") + 1]
        int8_transpose = None if v == "off" else v
    # --bf16-joins: round the YOLACT chain's ResNet residual joins /
    # feature taps to bf16 instead of the flax-exact f32 flow — the
    # joins feed int8 requantizers, and their f32 maps are pure HBM
    # traffic (~471 MB per layer1 map at batch 128).  Decoded-delta
    # evidence: yolact_parity_check rung 'pc+outputs+head+join16'.
    # The north-star profile serves bf16 joins by default (certified:
    # yolact_parity_check 'pc+outputs+head+join16' — every decoded
    # delta <=1e-3, mask IoU 0.9966; interleaved A/B 1.043x,
    # joins_ab_probe); --exact-flow restores the flax-exact f32 flow.
    if "--bf16-joins" in sys.argv or (
        north_star and "--exact-flow" not in sys.argv
    ):
        yl_join_dtype = jnp.bfloat16
    else:
        yl_join_dtype = None
    # Chain-int8 now covers --deform too (round 4, VERDICT r3 item 4):
    # the DCN-IDA graph serves with an int8 trunk via
    # dla34_chain_forward(deform=True) — DCN stages stay bf16 (the
    # Pallas kernel is VPU-sampling-bound at the measured roof; int8
    # buys nothing inside it), but the trunk's conv->conv links drop
    # the per-layer interceptor's double buffers.
    chain = int8 and "--per-layer-int8" not in sys.argv
    if chain:
        from tauv_vision_tpu.serving.quantize import strip_scales
        from tauv_vision_tpu.serving.quantize_chain import (
            make_centernet_chain_pipeline,
            make_yolact_chain_pipeline,
        )

        cn_scales = load_scales(
            cn_raw, cn_vars, frames,
            f"centernet{'_dcn' if deform else ''}_b{batch_size}",
            per_channel=parity,
        )
        yl_scales = load_scales(
            yl_raw, yl_vars, frames, f"yolact_b{batch_size}",
            per_channel=parity,
        )
        cn_corr = yl_corr = cn_gains = yl_gains = None
        if parity:
            cn_scales = strip_scales(cn_scales, bf16_tail)
            # YOLACT parity tail: the WHOLE shared prediction head runs
            # bf16 — the yolact_parity_check ladder measured the head
            # convs as the entire decoded-error source (score p95
            # 3.4e-3 with any part of the head int8 vs 3.0e-4 with it
            # bf16), while backbone+FPN+protonet int8 moved nothing.
            # The head is ~1 ms of the ~65 ms batch-128 budget.
            yl_tail = tuple(
                t for t in bf16_tail
                if not t.startswith(("head_", "level", "ida_up", "dla_up"))
            ) + ("prediction_head", "protonet/output")
            yl_scales = strip_scales(yl_scales, yl_tail)
            if mse:
                cn_scales = load_scales_mse(
                    cn_raw, cn_vars, frames,
                    f"centernet_b{batch_size}_{'-'.join(bf16_tail)}",
                    cn_scales,
                )
                yl_scales = load_scales_mse(
                    yl_raw, yl_vars, frames,
                    f"yolact_b{batch_size}_parity", yl_scales,
                )
            if bias_correct:
                cn_corr = load_corrections(
                    cn_raw, cn_vars, frames,
                    f"centernet_b{batch_size}_{'-'.join(bf16_tail)}",
                    cn_scales,
                )
                yl_corr = load_corrections(
                    yl_raw, yl_vars, frames,
                    f"yolact_b{batch_size}_{'-'.join(bf16_tail)}",
                    yl_scales,
                )
            if seq_correct:
                from tauv_vision_tpu.ops.image import preprocess
                from tauv_vision_tpu.serving.pipeline import (
                    IMAGENET_MEAN,
                    IMAGENET_STDDEV,
                )
                from tauv_vision_tpu.serving.quantize_chain import (
                    dla34_chain_forward,
                    yolact_chain_forward,
                )

                def cn_build(ctx):
                    fwd = dla34_chain_forward(
                        cn_model.object_config, cn_vars, cn_scales, ctx=ctx
                    )
                    return lambda f: fwd(preprocess(
                        f, (cn_cfg.in_h, cn_cfg.in_w), IMAGENET_MEAN,
                        IMAGENET_STDDEV, dtype=jnp.bfloat16,
                    ))

                def yl_build(ctx):
                    fwd = yolact_chain_forward(
                        yl_cfg, yl_vars, yl_scales, ctx=ctx
                    )
                    return lambda f: fwd(preprocess(
                        f, (yl_cfg.in_h, yl_cfg.in_w), yl_cfg.img_mean,
                        yl_cfg.img_stddev, dtype=jnp.bfloat16,
                    ))

                cn_gains, cn_corr = load_seq_corrections(
                    cn_build, cn_vars, frames,
                    f"centernet_b{batch_size}_{'-'.join(bf16_tail)}",
                    cn_scales,
                )
                yl_gains, yl_corr = load_seq_corrections(
                    yl_build, yl_vars, frames,
                    f"yolact_b{batch_size}_parity", yl_scales,
                )
        cn_q = make_centernet_chain_pipeline(
            cn_cfg, cn_model.object_config, cn_vars, cn_scales,
            n_detections=10, score_threshold=0.6, corrections=cn_corr,
            gains=cn_gains, deform=deform, dcn_max_offset=dcn_max_offset,
            offset_bound=dcn_max_offset if dcn_bound else None,
            join_dtype=yl_join_dtype,
        )
        yl_q = make_yolact_chain_pipeline(
            yl_cfg, yl_vars, yl_scales, top_k=20, iou_threshold=0.5,
            confidence_threshold=0.5, corrections=yl_corr, gains=yl_gains,
            int8_transpose=int8_transpose, join_dtype=yl_join_dtype,
        )
        print(
            f"chain-int8{'-parity' if parity else ''}: "
            f"centernet={len(cn_scales)} yolact="
            f"{len(yl_scales)} calibrated convs", file=sys.stderr,
        )
        cn_timed = lambda v, f: cn_q(f)  # noqa: E731
        yl_timed = lambda v, f: yl_q(f)  # noqa: E731
        if north_star:
            # North-star CN = the certified bf16 float path (see the
            # fused branch below); in unfused mode time that pipeline,
            # not the chain.
            cn_timed = cn_pipeline
    elif int8:
        cn_q, n_cn = quantize_pipeline(
            cn_raw, cn_vars, frames, f"centernet_b{batch_size}"
        )
        yl_q, n_yl = quantize_pipeline(
            yl_raw, yl_vars, frames, f"yolact_b{batch_size}"
        )
        print(f"quantized convs: centernet={n_cn} yolact={n_yl}",
              file=sys.stderr)
        cn_timed = lambda v, f: cn_q(f)  # noqa: E731
        yl_timed = lambda v, f: yl_q(f)  # noqa: E731
    else:
        cn_timed, yl_timed = cn_pipeline, yl_pipeline

    # --fused: both nets + both decodes in ONE jitted graph with the
    # 480->360 resize shared (serving/pipeline.make_combined_pipeline;
    # bit-identical decoded outputs).  The deployed system runs both
    # nodes on the same camera frames, so this is the production-shaped
    # combined graph; unfused mode times the two dispatches separately
    # and sums.
    # --no-fuse: measure the two nets as separate dispatches and sum
    # (the methodology of every other combined row).  The ONE-graph
    # fusion is the default for --north-star; measured on this chip the
    # fused dual-net graph runs ~9% below the sum of its parts (layout/
    # scheduling interactions absorb the CN head-fusion gain), so both
    # numbers are recorded.
    fused = ("--fused" in sys.argv or north_star) \
        and "--no-fuse" not in sys.argv
    fused_time = None
    if fused:
        import jax.numpy as jnp

        from tauv_vision_tpu.serving.pipeline import make_combined_pipeline

        if chain:
            from tauv_vision_tpu.serving.quantize_chain import (
                dla34_chain_forward,
                yolact_chain_forward,
            )

            if north_star:
                # CN on the certified float path: its decoded outputs
                # ARE the parity-suite-covered reference numerics.
                cn_fwd = lambda img: cn_model.apply(  # noqa: E731
                    cn_vars, img, train=False
                )
            else:
                cn_fwd = dla34_chain_forward(
                    cn_model.object_config, cn_vars, cn_scales,
                    corrections=cn_corr, gains=cn_gains, deform=deform,
                    dcn_max_offset=dcn_max_offset,
                    offset_bound=dcn_max_offset if dcn_bound else None,
                    join_dtype=yl_join_dtype,
                )
            yl_fwd = yolact_chain_forward(
                yl_cfg, yl_vars, yl_scales, corrections=yl_corr,
                gains=yl_gains, int8_transpose=int8_transpose,
                join_dtype=yl_join_dtype,
            )
        elif int8:
            raise SystemExit("--fused supports the chain and bf16 paths")
        else:
            cn_fwd = lambda img: cn_model.apply(  # noqa: E731
                cn_vars, img, train=False
            )
            yl_fwd = lambda img: yl_model.apply(  # noqa: E731
                yl_vars, img, train=False
            )
        combined = make_combined_pipeline(
            cn_fwd, cn_cfg, yl_fwd, yl_cfg,
            n_detections=10, score_threshold=0.6, top_k=20,
            iou_threshold=0.5, confidence_threshold=0.5,
        )
        # Tuned compiler options on every profile: the sweep measured
        # +2.7% on the north-star graph and chain_options_ab.py
        # measured neutral-to-positive on chain-int8 (CN 0.998x,
        # YL 1.007x) — see BENCH.md "XLA compiler options".
        fused_time = time_chained(
            lambda v, f: combined(f), None, frames, tuned_options=True
        )
        fps = batch_size / fused_time
        cn_time = yl_time = None
    else:
        cn_time = time_chained(cn_timed, cn_vars, frames,
                               tuned_options=True)
        yl_time = time_chained(yl_timed, yl_vars, frames,
                               tuned_options=True)

        # Combined: every frame goes through both nets end-to-end.
        fps = batch_size / (cn_time + yl_time)

    decode_p50 = time_decode(cn_model, cn_vars, cn_cfg, frames, "centernet")

    result = {
        "metric": "640x480 frames/sec/chip CenterNet+YOLACT inference",
        "value": round(float(fps), 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(float(fps) / BASELINE_FPS, 4),
        "detail": {
            "batch_size": batch_size,
            "deform_conv": deform,
            "dcn_impl": dcn_impl if deform else None,
            "dcn_max_offset": dcn_max_offset if deform else None,
            "dcn_bound": dcn_bound if deform else None,
            "int8": int8,
            "int8_mode": (
                ("north-star" if north_star
                 else ("chain-parity" if parity else "chain"))
                if chain else "per-layer"
            ) if int8 else None,
            "early_pack": early_pack or None,
            "int8_transpose": int8_transpose if chain else None,
            "bf16_joins": (yl_join_dtype is not None) if chain else None,
            "bn_bf16": bn_bf16,
            "f32_stages": list(f32_stages) or None,
            "up_impl": up_impl if up_impl != "dilated" else None,
            "bf16_tail": list(bf16_tail) if (chain and parity) else None,
            "mse_clip": mse if (chain and parity) else None,
            "bias_correct": bias_correct if (chain and parity) else None,
            "seq_correct": seq_correct if (chain and parity) else None,
            "fused": fused,
            "centernet_fps": (
                round(batch_size / cn_time, 2) if cn_time else None
            ),
            "yolact_fps": (
                round(batch_size / yl_time, 2) if yl_time else None
            ),
            "decode_p50_ms": round(decode_p50 * 1e3, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
