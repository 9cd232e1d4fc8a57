"""int8 PTQ accuracy on a TRAINED production-scale model (VERDICT r1
items 1b/4): train DLA-34 CenterNet on synthetic squares at its native
640x360, then compare the int8 serving path's decoded detections against
the bf16 path and against truth.

The round-1 int8 evidence was a toy-model test
(tests/test_quantize_trained.py); this runs the real serving
architecture (CenterpointDLA34, plain-conv IDA) at the real resolution
and reports:
  - AP vs truth for bf16 and for int8 (same PR-curve method as the
    reference evaluator);
  - detection-level agreement between int8 and bf16 (matched fraction,
    center-distance and score deltas).

Runs on the TPU chip (~5 min: ~47 s compile + ~300 train steps at
~273 ms).  CPU works too but is slow.

  python -m tauv_vision_tpu.scripts.quantize_accuracy_check \
      --steps 300 --out /tmp/quant_acc.json
"""

from __future__ import annotations

import argparse
import json
from math import pi

import numpy as np

IN_H, IN_W = 360, 640


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--eval-batches", type=int, default=4)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--percentile", type=float, default=None,
                        help="activation calibration percentile (None=absmax)")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    import pathlib

    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    from tauv_vision_tpu.eval.detection_eval import (
        average_precision,
        detections_from_arrays,
        iou_match,
        precision_recall_curve,
        truths_from_batch,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
    from tauv_vision_tpu.serving.centernet_decode import decode
    from tauv_vision_tpu.serving.quantize import calibrate, quantized_call
    from tauv_vision_tpu.train import (
        TrainState,
        adam_with_clip,
        make_centernet_train_step,
    )

    object_config = ObjectConfigSet(configs=(
        ObjectConfig(
            id="square",
            yaw=AngleConfig(train=False, modulo=2 * pi),
            pitch=AngleConfig(train=False, modulo=2 * pi),
            roll=AngleConfig(train=False, modulo=2 * pi),
            train_depth=False, train_keypoints=False, keypoints=None,
        ),
    ))
    model_config = CenternetModelConfig(
        in_h=IN_H, in_w=IN_W,
        backbone_heights=(2, 2, 2, 2, 2),
        backbone_channels=(128,) * 6,
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    train_config = CenternetTrainConfig(
        lr=args.lr, batch_size=args.batch_size, n_batches=0, n_epochs=1,
        heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
        heatmap_sigma_factor=0.1, keypoint_heatmap_sigma=2.0,
        keypoint_affinity_sigma=2.0, loss_lambda_keypoint_heatmap=1.0,
        loss_lambda_keypoint_affinity=1.0, loss_lambda_size=0.1,
        loss_lambda_offset=1.0, loss_lambda_angle=1.0,
        loss_lambda_depth=1.0, max_objects=4, max_keypoints=4,
    )
    square_cfg = SquareDatasetConfig(
        in_h=IN_H, in_w=IN_W, max_objects=4, min_side=24, max_side=96,
        rotate=False,
    )

    model = CenterpointDLA34(
        object_config=object_config, dtype=jnp.bfloat16, deform=False
    )
    img0 = jnp.zeros((1, IN_H, IN_W, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, img0, train=False))(
        jax.random.key(0)
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(args.lr, 1.0),
    )
    step_fn = make_centernet_train_step(
        model, model_config, train_config, object_config
    )

    rng = np.random.default_rng(7)
    print("training DLA-34 on synthetic squares...", flush=True)
    for step in range(args.steps):
        img, truth = generate_square_batch(rng, args.batch_size, square_cfg)
        truth = jax.tree_util.tree_map(jnp.asarray, truth)
        state, losses = step_fn(state, jnp.asarray(img), truth)
        if step % 25 == 0:
            print(f"step {step}: total={float(losses.total):.4f}",
                  flush=True)

    trained = {"params": state.params}
    if state.batch_stats is not None:
        trained["batch_stats"] = state.batch_stats

    # Serving fns: synthetic floats [0,1] -> uint8 frames at the model's
    # native 640x360 (no resize — truth stays aligned).
    def raw_pipeline(frames_uint8):
        img = frames_uint8.astype(jnp.bfloat16) / 255.0
        prediction = model.apply(trained, img, train=False)
        return decode(prediction, model_config, 10, 0.3)

    eval_rng = np.random.default_rng(1007)
    eval_sets = [
        generate_square_batch(eval_rng, args.batch_size, square_cfg)
        for _ in range(args.eval_batches)
    ]
    eval_frames = [
        jnp.asarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        for img, _ in eval_sets
    ]

    print("calibrating int8...", flush=True)
    scales = calibrate(
        raw_pipeline, [eval_frames[0][:2]], percentile=args.percentile
    )
    bf16_fn = jax.jit(raw_pipeline)
    int8_fn = jax.jit(quantized_call(raw_pipeline, scales))

    from tauv_vision_tpu.serving.quantize_chain import dla34_chain_forward

    chain_forward = dla34_chain_forward(object_config, trained, scales)

    def chain_pipeline(frames_uint8):
        img = frames_uint8.astype(jnp.bfloat16) / 255.0
        prediction = chain_forward(img)
        return decode(prediction, model_config, 10, 0.3)

    chain_fn = jax.jit(chain_pipeline)

    def collect(fn):
        out = []
        for frames in eval_frames:
            d = fn(frames)
            out.extend(detections_from_arrays(
                np.asarray(d.valid), np.asarray(d.score),
                np.asarray(d.label), np.asarray(d.y), np.asarray(d.x),
                np.asarray(d.h), np.asarray(d.w),
            ))
        return out

    print("decoding bf16 + int8 (per-layer + chain)...", flush=True)
    dets_bf16 = collect(bf16_fn)
    dets_int8 = collect(int8_fn)
    dets_chain = collect(chain_fn)
    truths = []
    for _, truth in eval_sets:
        truths.extend(truths_from_batch(truth))

    result = {
        "steps": args.steps,
        "quantized_convs": len(scales),
        "percentile": args.percentile,
        "n_eval_samples": len(truths),
    }
    for name, dets in (("bf16", dets_bf16), ("int8", dets_int8),
                       ("int8_chain", dets_chain)):
        _, precision, recall = precision_recall_curve(
            dets, truths, iou_match(0.5)
        )
        result[f"{name}_ap_iou0.5"] = round(
            average_precision(precision, recall), 4
        )

    def agreement(dets_a, dets_b, tag):
        # detection agreement vs bf16: greedy same-label nearest match.
        center_deltas, score_deltas, matched, total = [], [], 0, 0
        for db, di in zip(dets_a, dets_b):
            total += len(db)
            used = set()
            for d in db:
                best, best_dist = None, 0.05  # 5% of image
                for j, q in enumerate(di):
                    if j in used or q.label != d.label:
                        continue
                    dist = ((d.y - q.y) ** 2 + (d.x - q.x) ** 2) ** 0.5
                    if dist < best_dist:
                        best, best_dist = j, dist
                if best is not None:
                    used.add(best)
                    matched += 1
                    center_deltas.append(best_dist)
                    score_deltas.append(abs(d.score - di[best].score))

        result["bf16_detections"] = total
        result[f"{tag}_matched_fraction"] = round(
            matched / max(total, 1), 4
        )
        if center_deltas:
            result[f"{tag}_center_delta_p50"] = round(
                float(np.percentile(center_deltas, 50)), 5
            )
            result[f"{tag}_center_delta_p95"] = round(
                float(np.percentile(center_deltas, 95)), 5
            )
            result[f"{tag}_score_delta_p50"] = round(
                float(np.percentile(score_deltas, 50)), 5
            )
            result[f"{tag}_score_delta_p95"] = round(
                float(np.percentile(score_deltas, 95)), 5
            )

    agreement(dets_bf16, dets_int8, "int8")
    agreement(dets_bf16, dets_chain, "int8_chain")
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(result, fp, indent=2)
    return result


if __name__ == "__main__":
    main()
