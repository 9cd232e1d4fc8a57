"""YOLACT int8 decoded-parity check (the YOLACT half of the north-star
config).

The CenterNet half of the serving parity evidence comes from
``quantize_accuracy_check --sweep``; the combined-headline metric
(BASELINE.json: CenterNet+YOLACT at >= 1000 fps with decoded outputs
within 1e-3) equally constrains YOLACT, whose chain-int8 profile keeps
the protonet — 80% of its FLOPs — in int8.  This trains the production
serving architecture (ResNet-18 trunk, FPN, 8-prototype protonet,
shared prediction head — yolact/scripts/train.py:28-50 scale) on
synthetic instance-seg squares at its native 640x360, then walks a
mixed-precision ladder comparing decoded detections (boxes, scores,
masks — yolact_node.py:127-135 outputs) between the bf16 pipeline and
each chain-int8 rung.

  python -m tauv_vision_tpu.scripts.yolact_parity_check \
      --steps 300 --out /tmp/yolact_parity.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np

IN_H, IN_W = 360, 640

# Ladder: which chain stages stay int8.  "outputs" is the serving
# profile's tail (bench.py --parity-int8): the decode-facing convs
# (prediction-head outputs, protonet output) run bf16.
LADDER = (
    ("pc_all", ()),
    ("pc+outputs",
     ("prediction_head/classification", "prediction_head/box",
      "prediction_head/mask", "protonet/output")),
    ("pc+outputs+head",
     ("prediction_head", "protonet/output")),
    ("pc+outputs+protonet",
     ("prediction_head/classification", "prediction_head/box",
      "prediction_head/mask", "protonet/")),
    ("pc+outputs+fpn",
     ("prediction_head/classification", "prediction_head/box",
      "prediction_head/mask", "protonet/output", "fpn/")),
    ("pc+outputs+backbone",
     ("prediction_head/classification", "prediction_head/box",
      "prediction_head/mask", "protonet/output", "backbone/")),
    # Round-4 served-dtype rungs (VERDICT r3 item 2).  Entries may carry
    # a third element: path substrings whose convs run in FLOAT32 (the
    # decode-facing outputs).  Read against --baseline f32: the bf16
    # pipeline's own score rounding is the context (flax-bf16 rung).
    ("flax-bf16", (), (), "flax_bf16"),
    # The passing int8 rung (whole head + proto output bf16) with those
    # same convs upgraded to f32 — the north-star YOLACT candidate.
    ("pc+f32head",
     ("prediction_head", "protonet/output"),
     ("prediction_head", "protonet/output")),
    # No int8 anywhere, f32 head + proto output: isolates the trunk's
    # bf16 feature noise from head rounding.
    ("float+f32head",
     ("backbone", "fpn", "protonet", "prediction_head"),
     ("prediction_head", "protonet/output")),
    # Round-4 int8-transpose rung: the passing serving rung with the
    # protonet upsamples lowered to int8 (phase-exact XLA form,
    # ops/pallas/transpose_conv.transpose_conv2x_int8_phase_xla).  The
    # protonet feeds ONLY mask_prototype, so scores/boxes are
    # bit-identical to pc+outputs+head; the rung certifies the mask
    # deltas of the int8 upsample quantization.
    ("pc+outputs+head+int8T",
     ("prediction_head", "protonet/output"), (), "int8_transpose"),
    # Round-4 bf16-joins rung: the passing serving rung with the ResNet
    # residual joins / feature taps rounded to bf16 (ChainCtx
    # join_dtype) — the HBM lever behind bench --bf16-joins.  The joins
    # feed int8 requantizers, so the expected perturbation is a
    # fraction of the already-measured int8 noise; this rung measures
    # it on decoded outputs.
    ("pc+outputs+head+join16",
     ("prediction_head", "protonet/output"), (), "join16"),
)


def pair_deltas(dets_a, dets_b):
    """Greedy same-label nearest-center matching between two decoded
    batches; returns box/score/mask agreement stats.  ``dets_*`` are
    lists of per-batch YolactDetections (host numpy)."""
    center_d, score_d, size_d, mask_d, mask_iou = [], [], [], [], []
    matched, total = 0, 0
    for da, db in zip(dets_a, dets_b):
        va = np.asarray(da.valid)
        vb = np.asarray(db.valid)
        for b in range(va.shape[0]):
            ia = [i for i in range(va.shape[1]) if va[b, i]]
            ib = [i for i in range(vb.shape[1]) if vb[b, i]]
            total += len(ia)
            used = set()
            for i in ia:
                best, best_dist = None, 0.05
                for j in ib:
                    if j in used or int(db.label[b, j]) != int(
                        da.label[b, i]
                    ):
                        continue
                    dist = float(
                        (da.box[b, i, 0] - db.box[b, j, 0]) ** 2
                        + (da.box[b, i, 1] - db.box[b, j, 1]) ** 2
                    ) ** 0.5
                    if dist < best_dist:
                        best, best_dist = j, dist
                if best is None:
                    continue
                used.add(best)
                matched += 1
                j = best
                center_d.append(best_dist)
                score_d.append(
                    abs(float(da.score[b, i]) - float(db.score[b, j]))
                )
                size_d.append(max(
                    abs(float(da.box[b, i, 2] - db.box[b, j, 2])),
                    abs(float(da.box[b, i, 3] - db.box[b, j, 3])),
                ))
                ma = np.asarray(da.mask[b, i], np.float32)
                mb = np.asarray(db.mask[b, j], np.float32)
                sel = np.maximum(ma, mb) > 0.05
                if sel.any():
                    mask_d.append(np.abs(ma - mb)[sel])
                ba, bb = ma > 0.5, mb > 0.5
                union = (ba | bb).sum()
                if union:
                    mask_iou.append((ba & bb).sum() / union)

    stats = {
        "total": total,
        "matched_fraction": round(matched / max(total, 1), 4),
    }
    for vals, what in ((center_d, "center"), (score_d, "score"),
                       (size_d, "size")):
        if not vals:
            continue
        for p in (50, 95):
            stats[f"{what}_delta_p{p}"] = round(
                float(np.percentile(vals, p)), 6
            )
        stats[f"{what}_delta_max"] = round(float(np.max(vals)), 6)
    if mask_d:
        pooled = np.concatenate(mask_d)
        stats["mask_delta_p50"] = round(float(np.percentile(pooled, 50)), 6)
        stats["mask_delta_p95"] = round(float(np.percentile(pooled, 95)), 6)
        stats["mask_iou_mean"] = round(float(np.mean(mask_iou)), 4)
    if score_d:
        stats["all_deltas_le_1e3"] = bool(
            np.percentile(score_d, 95) <= 1e-3
            and np.percentile(center_d, 95) <= 1e-3
            and np.percentile(size_d, 95) <= 1e-3
        )
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--eval-batches", type=int, default=32,
                        help="eval set = eval_batches * 16 images")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--cal-frames", type=int, default=16)
    parser.add_argument("--rungs", nargs="*", default=None)
    parser.add_argument("--save-model", default=None)
    parser.add_argument("--load-model", default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--baseline", choices=("bf16", "f32"),
                        default="bf16",
                        help="f32: compare rungs against the float32 "
                        "pipeline (the served-dtype certification frame; "
                        "VERDICT r3 item 2)")
    args = parser.parse_args(argv)

    import pathlib

    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tauv_vision_tpu.configs import YolactModelConfig, YolactTrainConfig
    from tauv_vision_tpu.data.synthetic import (
        SquareDatasetConfig,
        generate_square_seg_batch,
    )
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.serving.quantize import calibrate, strip_scales
    from tauv_vision_tpu.serving.quantize_chain import yolact_chain_forward
    from tauv_vision_tpu.serving.yolact_decode import decode_yolact
    from tauv_vision_tpu.train import (
        TrainState,
        adam_with_clip,
        make_yolact_train_step,
    )
    from tauv_vision_tpu.train.yolact_task import YolactTruth

    # Production serving architecture (bench.py build_yolact) on the
    # 1-class synthetic task.
    model_config = YolactModelConfig(
        in_w=IN_W, in_h=IN_H, feature_depth=256, n_classes=1,
        n_prototype_masks=8,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.4,
        iou_neg_threshold=0.3, negative_example_ratio=3,
    )
    square_cfg = SquareDatasetConfig(
        in_h=IN_H, in_w=IN_W, max_objects=4, min_side=32, max_side=128,
        rotate=False,
    )
    model = Yolact(model_config, dtype=jnp.bfloat16)

    if args.load_model:
        import pickle

        with open(args.load_model, "rb") as fp:
            trained = pickle.load(fp)
        trained = jax.tree_util.tree_map(jnp.asarray, trained)
        print(f"loaded trained variables from {args.load_model}",
              flush=True)
    else:
        train_config = YolactTrainConfig(
            lr=args.lr, momentum=0.9, weight_decay=0.0, grad_max_norm=1.0,
            n_epochs=1, batch_size=args.batch_size, epoch_n_batches=1,
            max_objects=square_cfg.max_objects,
        )
        img0 = jnp.zeros((1, IN_H, IN_W, 3))
        variables = jax.jit(lambda k: model.init(k, img0, train=False))(
            jax.random.key(0)
        )
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=adam_with_clip(args.lr, 1.0),
        )
        step_fn = make_yolact_train_step(model, model_config, train_config)
        rng = np.random.default_rng(11)
        print("training YOLACT on synthetic seg squares...", flush=True)
        for step in range(args.steps):
            img, fields = generate_square_seg_batch(
                rng, args.batch_size, square_cfg
            )
            truth = YolactTruth(
                valid=jnp.asarray(fields["valid"]),
                classification=jnp.asarray(fields["classification"]),
                box=jnp.asarray(fields["box"]),
                seg_map=jnp.asarray(fields["seg"].astype(np.int32)),
                img_valid=jnp.asarray(fields["img_valid"]),
            )
            state, losses = step_fn(state, jnp.asarray(img), truth)
            if step % 25 == 0:
                print(f"step {step}: total={float(losses.total):.4f}",
                      flush=True)
        trained = {"params": state.params}
        if state.batch_stats is not None:
            trained["batch_stats"] = state.batch_stats
        if args.save_model:
            import pickle

            host = jax.tree_util.tree_map(np.asarray, trained)
            with open(args.save_model, "wb") as fp:
                pickle.dump(host, fp)
            print(f"saved trained variables to {args.save_model}",
                  flush=True)

    def raw_forward(frames_uint8):
        img = frames_uint8.astype(jnp.bfloat16) / 255.0
        return model.apply(trained, img, train=False)

    def raw_pipeline(frames_uint8):
        return decode_yolact(raw_forward(frames_uint8), model_config,
                             top_k=20, iou_threshold=0.5,
                             confidence_threshold=0.5)

    model_f32 = Yolact(model_config, dtype=jnp.float32)

    def f32_pipeline(frames_uint8):
        img = frames_uint8.astype(jnp.float32) / 255.0
        return decode_yolact(model_f32.apply(trained, img, train=False),
                             model_config, top_k=20, iou_threshold=0.5,
                             confidence_threshold=0.5)

    eval_rng = np.random.default_rng(2024)
    eval_frames = []
    for _ in range(args.eval_batches):
        img, _ = generate_square_seg_batch(eval_rng, 16, square_cfg)
        eval_frames.append(jnp.asarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ))

    def collect(fn):
        out = []
        for frames in eval_frames:
            d = fn(frames)
            out.append(jax.tree_util.tree_map(np.asarray, d))
        return out

    print(f"decoding {args.baseline} reference...", flush=True)
    dets_bf16 = collect(jax.jit(
        f32_pipeline if args.baseline == "f32" else raw_pipeline
    ))

    print("calibrating (per-channel)...", flush=True)
    cal = [f[: args.cal_frames] for f in eval_frames[:1]]
    scales_pc = calibrate(raw_forward, cal, per_channel=True)

    rows = []
    for entry in LADDER:
        name, strip = entry[0], entry[1]
        f32_paths = entry[2] if len(entry) > 2 else ()
        if args.rungs is not None and name not in args.rungs:
            continue
        if len(entry) > 3 and entry[3] == "flax_bf16":
            print("rung flax-bf16 (serving pipeline, no chain)...",
                  flush=True)
            dets = collect(jax.jit(raw_pipeline))
            stats = pair_deltas(dets_bf16, dets)
            stats["name"] = name
            stats["int8_convs"] = 0
            rows.append(stats)
            print(f"  score_p95={stats.get('score_delta_p95')}"
                  f" center_p95={stats.get('center_delta_p95')}"
                  f" size_p95={stats.get('size_delta_p95')}"
                  f" mask_iou={stats.get('mask_iou_mean')}"
                  f" le_1e3={stats.get('all_deltas_le_1e3')}", flush=True)
            continue
        mode = entry[3] if len(entry) > 3 else None
        int8_t = "phase-xla" if mode == "int8_transpose" else None
        join_dtype = jnp.bfloat16 if mode == "join16" else None
        scales = strip_scales(scales_pc, strip) if strip else scales_pc
        fwd = yolact_chain_forward(model_config, trained, scales,
                                   f32_paths=f32_paths,
                                   int8_transpose=int8_t,
                                   join_dtype=join_dtype)

        def chain_pipeline(frames_uint8):
            img = frames_uint8.astype(jnp.bfloat16) / 255.0
            return decode_yolact(fwd(img), model_config, top_k=20,
                                 iou_threshold=0.5,
                                 confidence_threshold=0.5)

        print(f"rung {name}: {len(scales)} int8 convs"
              f"{f' (f32: {f32_paths})' if f32_paths else ''}...",
              flush=True)
        dets = collect(jax.jit(chain_pipeline))
        stats = pair_deltas(dets_bf16, dets)
        stats["name"] = name
        stats["int8_convs"] = len(scales)
        rows.append(stats)
        print(
            f"  match={stats['matched_fraction']}"
            f" score_p95={stats.get('score_delta_p95')}"
            f" center_p95={stats.get('center_delta_p95')}"
            f" size_p95={stats.get('size_delta_p95')}"
            f" mask_p95={stats.get('mask_delta_p95')}"
            f" mask_iou={stats.get('mask_iou_mean')}"
            f" le_1e3={stats.get('all_deltas_le_1e3')}",
            flush=True,
        )

    result = {
        "sweep": rows,
        "n_eval_images": 16 * args.eval_batches,
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(result, fp, indent=2)
    return result


if __name__ == "__main__":
    main()
