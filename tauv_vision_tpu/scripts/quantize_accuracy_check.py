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
import dataclasses
import json
from math import pi

import numpy as np

IN_H, IN_W = 360, 640

# Mixed-precision ladder (--sweep): each rung moves another tail stage
# of the DLA-34 chain back to bf16, on top of per-channel activation
# scales + bias correction.  Stage path substrings follow the chain's
# parameter tree (serving/quantize_chain.py dla34_chain_forward):
# trunk levels -> dla_up -> ida_up -> heads.
SWEEP_LADDER = (
    ("absmax", dict(per_channel=False, bias_correct=False, strip=())),
    ("per_channel", dict(per_channel=True, bias_correct=False, strip=())),
    ("pc+biascorr", dict(per_channel=True, bias_correct=True, strip=())),
    ("pc+bc+bf16heads",
     dict(per_channel=True, bias_correct=True, strip=("head_",))),
    ("pc+bc+bf16heads+idaup",
     dict(per_channel=True, bias_correct=True,
          strip=("head_", "ida_up"))),
    ("pc+bc+bf16heads+idaup+dlaup",
     dict(per_channel=True, bias_correct=True,
          strip=("head_", "ida_up", "dla_up"))),
    ("pc+bc+bf16tail+lvl5",
     dict(per_channel=True, bias_correct=True,
          strip=("head_", "ida_up", "dla_up", "level5"))),
    # Round-3 second ladder: the first ladder showed the score-delta
    # floor (~5.5e-3) comes from the EARLY trunk, not the tail, and
    # that bias correction hurts at this calibration size.  The early
    # 16/32-ch levels run at ~34% of the int8 MXU roof anyway
    # (BENCH.md "Roofline context"), so moving them to bf16 costs
    # little throughput while removing the dominant error source.
    ("pc+bf16heads",
     dict(per_channel=True, bias_correct=False, strip=("head_",))),
    ("pc+bf16heads+early01",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_"))),
    ("pc+bf16heads+early012",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level2"))),
    ("pc+bf16heads+early0123",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level2", "level3"))),
    ("pc+bf16heads+early01+updown",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "ida_up", "dla_up"))),
    # Third ladder: MSE-optimal per-channel clipping
    # (serving/quantize.refine_scales_mse) on top of the best rung.
    ("mse+bf16heads+early01",
     dict(per_channel=True, bias_correct=False, mse=True,
          strip=("head_", "level0_", "level1_"))),
    ("mse+bf16heads+early01+updown",
     dict(per_channel=True, bias_correct=False, mse=True,
          strip=("head_", "level0_", "level1_", "ida_up", "dla_up"))),
    ("mse+bc+bf16heads+early01+updown",
     dict(per_channel=True, bias_correct=True, mse=True,
          strip=("head_", "level0_", "level1_", "ida_up", "dla_up"))),
    # Fourth ladder: MSE clipping measured WORSE for tail agreement
    # (clipping trades outlier fidelity for bulk resolution; parity is
    # a tail metric) — walk the plain per-channel-absmax ladder deeper
    # into the trunk instead.
    ("pc+bf16heads+early012+updown",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level2",
                 "ida_up", "dla_up"))),
    ("pc+bf16heads+early01+updown+lvl5",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level5",
                 "ida_up", "dla_up"))),
    ("pc+bf16heads+early0123+updown",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "ida_up", "dla_up"))),
    # Fifth ladder: sequential per-channel affine recalibration
    # (quantize_chain.calibrate_sequential) — each conv's epilogue gets
    # a (gain, offset) fitted against the float chain with upstream
    # errors included, free at serving time.  Run on the best plain
    # rungs from ladder four.
    ("seqmean+bf16heads+early01+updown",
     dict(per_channel=True, bias_correct=False, seq="mean",
          strip=("head_", "level0_", "level1_", "ida_up", "dla_up"))),
    ("seq+bf16heads+early01+updown",
     dict(per_channel=True, bias_correct=False, seq="affine",
          strip=("head_", "level0_", "level1_", "ida_up", "dla_up"))),
    ("seq+bf16heads+early012+updown",
     dict(per_channel=True, bias_correct=False, seq="affine",
          strip=("head_", "level0_", "level1_", "level2",
                 "ida_up", "dla_up"))),
    ("seq+bf16heads+early0123+updown",
     dict(per_channel=True, bias_correct=False, seq="affine",
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "ida_up", "dla_up"))),
    # Sixth ladder: single-level int8 subsets — maps each trunk level's
    # error contribution so the headline config can keep int8 exactly
    # where the fps/error trade is best (sequential recalibration
    # measured as a dead end: the residual error is input-dependent
    # noise, not a per-channel affine).
    ("pc+only-lvl2",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level3", "level4",
                 "level5", "ida_up", "dla_up"))),
    ("pc+only-lvl23",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level4", "level5",
                 "ida_up", "dla_up"))),
    ("pc+only-lvl234",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level5",
                 "ida_up", "dla_up"))),
    ("pc+only-lvl5",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "level4", "ida_up", "dla_up"))),
    ("pc+only-lvl4",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "level5", "ida_up", "dla_up"))),
    ("pc+only-lvl34",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level0_", "level1_", "level2",
                 "level5", "ida_up", "dla_up"))),
    # Control rung: ZERO int8 convs — measures the chain forward's own
    # float-path drift vs the flax forward (different rounding orders at
    # bf16: folded-BN f32 affine + f32 joins vs flax's bf16 BN).  The
    # single-level rungs all floor at ~1.6e-3 regardless of WHICH level
    # is int8, which smells like implementation drift, not quant noise.
    ("pc+none",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "level", "ida_up", "dla_up", "base"))),
    # Seventh ladder: with the chain float path now BIT-EXACT vs flax
    # (drift rung pc+none == 0.0), re-test the calibration refinements
    # whose earlier verdicts were drift-contaminated, on the best rung
    # (lvl4+lvl5 int8: score p95 4.9e-4; size p95 1.42e-3 binding).
    ("mse+bf16heads+early0123+updown",
     dict(per_channel=True, bias_correct=False, mse=True,
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "ida_up", "dla_up"))),
    # Margin rungs: the size-delta floor (~1.3e-3) is level-count
    # independent, pointing at eval-time CLIPPING — absmax scales from
    # 16 calibration frames undershoot the 512-image eval's activation
    # tails.  A headroom factor on the activation scales trades a hair
    # of resolution for no clipping.
    ("pc+early0123+updown+margin1.1",
     dict(per_channel=True, bias_correct=False, margin=1.1,
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "ida_up", "dla_up"))),
    ("pc+early0123+updown+margin1.25",
     dict(per_channel=True, bias_correct=False, margin=1.25,
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "ida_up", "dla_up"))),
    ("pc+only-lvl5+margin1.25",
     dict(per_channel=True, bias_correct=False, margin=1.25,
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "level4", "ida_up", "dla_up"))),
    # Eighth ladder: ASYMMETRIC activation quantization
    # (quantize.calibrate_range + the zero-point offset map in
    # quantize_chain) — ReLU inputs use the full 256-level grid,
    # halving activation noise for free.
    ("asym+early0123+updown",
     dict(per_channel=True, bias_correct=False, asym=True,
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "ida_up", "dla_up"))),
    ("asym+early01+updown",
     dict(per_channel=True, bias_correct=False, asym=True,
          strip=("head_", "level0_", "level1_", "ida_up", "dla_up"))),
    ("asym+early012+updown",
     dict(per_channel=True, bias_correct=False, asym=True,
          strip=("head_", "level0_", "level1_", "level2",
                 "ida_up", "dla_up"))),
    # Ninth ladder: GPTQ-style error-compensated weight rounding
    # (quantize.calibrate_gptq) on top of asym activations — the two
    # noise terms are independent, so halving each roughly halves the
    # decoded delta.
    ("gptq+asym+early0123+updown",
     dict(per_channel=True, bias_correct=False, asym=True, gptq=True,
          strip=("head_", "level0_", "level1_", "level2", "level3",
                 "ida_up", "dla_up"))),
    ("gptq+asym+early012+updown",
     dict(per_channel=True, bias_correct=False, asym=True, gptq=True,
          strip=("head_", "level0_", "level1_", "level2",
                 "ida_up", "dla_up"))),
    ("gptq+asym+early01+updown",
     dict(per_channel=True, bias_correct=False, asym=True, gptq=True,
          strip=("head_", "level0_", "level1_", "ida_up", "dla_up"))),
    # Pseudo-rung: the flax bf16 serving pipeline itself (no chain, no
    # int8).  Meaningful with --baseline f32: measures the bf16
    # serving path's own decoded drift vs the f32 reference — the
    # context every chain rung's number must be read against.
    ("flax-bf16", dict(per_channel=True, bias_correct=False, strip=(),
                       flax_bf16=True)),
    # Round-4 HBM lever rung: the flax bf16 pipeline with BatchNorm
    # OUTPUTS rounded to bf16 (models/centerpoint_dla._bn bn_out — the
    # BN math stays f32).  Read against --baseline f32 next to
    # flax-bf16: the delta between the two rows is the entire decoded
    # cost of halving every BN->join->relu map's HBM width.
    ("flax-bf16-bn16", dict(per_channel=True, bias_correct=False, strip=(),
                            flax_bf16=True, bn16=True)),
    # Tenth ladder (round 4): served-dtype rungs for the north-star
    # config (VERDICT r3 items 2+3).  The bf16 pipeline's own decoded
    # scores sit ~2.25e-3 off the f32 forward (context rung above), so
    # NO all-bf16 config can claim <=1e-3 against the f32 reference on
    # scores.  These rungs, read with --baseline f32, decompose that
    # drift (head rounding vs trunk feature noise) and test whether
    # int8 IDA/DLAup — the largest below-roofline CN stage, 15.0 ms of
    # the 54.8 ms bf16 profile at ~63% MXU (BENCH.md) — survives the
    # bar when ONLY it is quantized.  "base" strips every trunk conv
    # (level0..5 paths live under model/base/), "head_" the heads.
    ("float-f32heads",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "base", "ida_up", "dla_up"),
          f32=("head_",))),
    ("ida-int8",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "base"))),
    ("ida-int8+f32heads",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "base"), f32=("head_",))),
    ("dlaup-int8+f32heads",  # ida_up (the final stage) stays bf16
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "base", "model/ida_up"), f32=("head_",))),
    # DLAUp's 12 aggregation convs int8, everything else bf16, no f32
    # upcast (the f32-heads rung measured NULL — trunk feature noise
    # dominates the bf16-vs-f32 drift, so upcasting heads buys nothing
    # and costs ms).  MEASURED VERDICT (round 4, 512 images, vs the
    # bf16 float path): score p95 9.9e-4 / center 3.2e-5 PASS, but
    # size p95 1.65e-3 FAILS the 1e-3 bar — consistent with round 3's
    # finding that ANY int8 in the CN graph breaks the size head.  The
    # north-star config keeps CenterNet all-bf16; this rung is the
    # recorded cheapest-failure point (BENCH.md round-4 ladder).
    ("dlaup-int8",
     dict(per_channel=True, bias_correct=False,
          strip=("head_", "base", "model/ida_up"))),
)


def _run_sweep(args, raw_pipeline, cal_frames, make_chain_fn, collect,
               pair_deltas, dets_bf16, truths, seq_calibrate=None,
               bn16_pipeline=None):
    """Walk SWEEP_LADDER, reporting decoded agreement vs bf16 per rung.

    The question this answers (VERDICT r2 item 1a): how much of the
    chain can stay int8 while decoded outputs hold p95 <= 1e-3 of the
    float path?  The chosen rung becomes the headline serving config if
    its fps clears 1000 (bench.py --chain-config).
    """
    import json

    from tauv_vision_tpu.serving.quantize import (
        calibrate,
        calibrate_bias_correction,
        calibrate_gptq,
        calibrate_range,
        refine_scales_mse,
        strip_scales,
    )

    print("calibrating (absmax + per-channel)...", flush=True)
    scales_absmax = calibrate(raw_pipeline, cal_frames,
                              percentile=args.percentile)
    scales_pc = calibrate(raw_pipeline, cal_frames,
                          percentile=args.percentile, per_channel=True)
    ladder = [
        (name, cfg) for name, cfg in SWEEP_LADDER
        if args.rungs is None or name in args.rungs
    ]
    scales_mse = None
    if any(cfg.get("mse") for _, cfg in ladder):
        print("refining scales (MSE-optimal clipping)...", flush=True)
        scales_mse = refine_scales_mse(raw_pipeline, cal_frames, scales_pc)
    ranges_all = None
    if any(cfg.get("asym") for _, cfg in ladder):
        print("calibrating (min, max) ranges for asymmetric...", flush=True)
        ranges_all = calibrate_range(raw_pipeline, cal_frames)

    rows = []
    for name, cfg in ladder:
        base = scales_pc if cfg["per_channel"] else scales_absmax
        if cfg.get("mse"):
            base = scales_mse
        scales = strip_scales(base, cfg["strip"]) if cfg["strip"] else base
        if cfg.get("margin"):
            m = cfg["margin"]
            scales = {k: v * m for k, v in scales.items()}
        ranges = None
        if cfg.get("asym"):
            ranges = {k: v for k, v in ranges_all.items() if k in scales}
        wq = None
        if cfg.get("gptq"):
            print(f"  GPTQ weight rounding for {name}...", flush=True)
            fold = ranges if ranges is not None else scales
            wq = calibrate_gptq(raw_pipeline, cal_frames, fold)
        corr = gains = None
        if cfg["bias_correct"]:
            # computed against THIS rung's scales (corrections depend on
            # the quantization scheme they compensate)
            print(f"  bias corrections for {name}...", flush=True)
            corr = calibrate_bias_correction(raw_pipeline, cal_frames,
                                             scales)
        if cfg.get("seq"):
            print(f"  sequential {cfg['seq']} recalibration for {name}...",
                  flush=True)
            gains, corr = seq_calibrate(scales, cfg["seq"])
        if cfg.get("flax_bf16"):
            import jax

            tag = "bn16" if cfg.get("bn16") else "bf16"
            print(f"rung flax-{tag} (serving pipeline, no chain)...",
                  flush=True)
            scales = {}
            dets = collect(jax.jit(
                bn16_pipeline if cfg.get("bn16") else raw_pipeline
            ))
        else:
            f32 = cfg.get("f32", ())
            print(f"rung {name}: {len(scales)} int8 convs"
                  f"{f' (f32: {f32})' if f32 else ''}...", flush=True)
            dets = collect(make_chain_fn(scales, corr, gains, ranges, wq,
                                         f32_paths=f32))
        stats = pair_deltas(dets_bf16, dets)
        stats["name"] = name
        stats["int8_convs"] = len(scales)
        rows.append(stats)
        print(
            f"  match={stats['matched_fraction']}"
            f" score_p95={stats.get('score_delta_p95')}"
            f" center_p95={stats.get('center_delta_p95')}"
            f" size_p95={stats.get('size_delta_p95')}"
            f" le_1e3={stats.get('all_deltas_le_1e3')}",
            flush=True,
        )

    result = {
        "sweep": rows,
        "n_eval_samples": len(truths),
        "bf16_detections": rows[0]["total"] if rows else 0,
        "percentile": args.percentile,
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(result, fp, indent=2)
    return result


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--eval-batches", type=int, default=32,
                        help="eval set = eval_batches * batch_size images "
                             "(default 512 images at batch 16)")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--percentile", type=float, default=None,
                        help="activation calibration percentile (None=absmax)")
    parser.add_argument("--per-channel", action="store_true",
                        help="per-input-channel activation scales")
    parser.add_argument("--bias-correct", action="store_true",
                        help="fold E[quant error] into conv epilogues")
    parser.add_argument("--bf16-heads", action="store_true",
                        help="leave the output head convs in bf16")
    parser.add_argument("--cal-batches", type=int, default=4,
                        help="number of eval batches used for calibration")
    parser.add_argument("--bootstrap", type=int, default=1000,
                        help="bootstrap resamples for AP CIs (0=off)")
    parser.add_argument("--save-model", default=None,
                        help="save trained variables (npz) and exit training "
                             "early use with --load-model to iterate on "
                             "quantization without retraining")
    parser.add_argument("--load-model", default=None)
    parser.add_argument("--sweep", action="store_true",
                        help="walk the mixed-precision ladder (absmax -> "
                             "per-channel -> +bias-correct -> +bf16 tail "
                             "stages) and report decoded deltas per rung")
    parser.add_argument("--rungs", nargs="*", default=None,
                        help="subset of SWEEP_LADDER rung names to run")
    parser.add_argument("--qat-steps", type=int, default=0,
                        help="QAT distillation fine-tuning (serving/qat.py): "
                             "fine-tune a fake-quantized copy of the model "
                             "to match the ORIGINAL model's outputs, then "
                             "report the int8 chain's decoded deltas vs the "
                             "original bf16 baseline")
    parser.add_argument("--qat-lr", type=float, default=2e-5)
    parser.add_argument("--qat-strip", default="head_",
                        help="comma-separated path substrings kept bf16 "
                             "during QAT and in the evaluated chain "
                             "(default: output heads only — the full-speed "
                             "serving layout)")
    parser.add_argument("--qat-size-weight", type=float, default=1.0,
                        help="distillation loss weight on the size head")
    parser.add_argument("--qat-save", default=None,
                        help="save QAT fine-tuned variables (pickle)")
    parser.add_argument("--qat-load", default=None,
                        help="skip fine-tuning, load QAT variables")
    parser.add_argument("--baseline", choices=("bf16", "f32"),
                        default="bf16",
                        help="float reference for the decoded-delta "
                             "comparison: the bf16 serving pipeline "
                             "(default) or the f32 flax forward (the "
                             "torch-f32-equivalent the parity suite "
                             "certifies)")
    parser.add_argument("--keypoints", action="store_true",
                        help="keypoint-pipeline parity: train with the 4 "
                             "square-corner keypoints and compare decoded "
                             "keypoint positions/scores (decode_keypoints, "
                             "the centernet node's full configuration) "
                             "between bf16 and chain-int8")
    parser.add_argument("--early-pack", type=int, default=0,
                        help="decoded-delta check for batch-group channel "
                             "packing (models/centerpoint_dla early_pack): "
                             "packed bf16 pipeline vs the unpacked bf16 "
                             "serving path, same trained variables")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    if args.keypoints and not args.sweep:
        parser.error("--keypoints requires --sweep (decoded-delta rows; "
                     "the AP path decodes plain detections only)")

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
    from tauv_vision_tpu.serving.quantize import (
        calibrate,
        calibrate_bias_correction,
        quantized_call,
        strip_scales,
    )
    from tauv_vision_tpu.train import (
        TrainState,
        adam_with_clip,
        make_centernet_train_step,
    )

    from tauv_vision_tpu.data.synthetic import SQUARE_CORNERS

    object_config = ObjectConfigSet(configs=(
        ObjectConfig(
            id="square",
            yaw=AngleConfig(train=False, modulo=2 * pi),
            pitch=AngleConfig(train=False, modulo=2 * pi),
            roll=AngleConfig(train=False, modulo=2 * pi),
            train_depth=False, train_keypoints=args.keypoints,
            keypoints=tuple((x, y, 0.0) for y, x in SQUARE_CORNERS)
            if args.keypoints else None,
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
        loss_lambda_depth=1.0, max_objects=4,
        max_keypoints=16 if args.keypoints else 4,
    )
    square_cfg = SquareDatasetConfig(
        in_h=IN_H, in_w=IN_W, max_objects=4, min_side=24, max_side=96,
        rotate=False, keypoints=args.keypoints,
    )

    model = CenterpointDLA34(
        object_config=object_config, dtype=jnp.bfloat16, deform=False
    )
    model_f32 = CenterpointDLA34(
        object_config=object_config, dtype=jnp.float32, deform=False
    )

    if args.load_model:
        import pickle

        with open(args.load_model, "rb") as fp:
            trained = pickle.load(fp)
        trained = jax.tree_util.tree_map(jnp.asarray, trained)
        print(f"loaded trained variables from {args.load_model}", flush=True)
    else:
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
            img, truth = generate_square_batch(rng, args.batch_size,
                                               square_cfg)
            truth = jax.tree_util.tree_map(jnp.asarray, truth)
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

    # Serving fns: synthetic floats [0,1] -> uint8 frames at the model's
    # native 640x360 (no resize — truth stays aligned).
    projection = jnp.asarray(
        [[500.0, 0.0, IN_W / 2], [0.0, 500.0, IN_H / 2], [0.0, 0.0, 1.0]],
        jnp.float32,
    )

    def decode_fn(prediction):
        if args.keypoints:
            from tauv_vision_tpu.serving.centernet_decode import (
                decode_keypoints,
            )

            return decode_keypoints(
                prediction, model_config, object_config, projection,
                n_detections=10, keypoint_n_detections=50,
                score_threshold=0.3, keypoint_score_threshold=0.3,
            )
        return decode(prediction, model_config, 10, 0.3)

    def raw_pipeline(frames_uint8):
        img = frames_uint8.astype(jnp.bfloat16) / 255.0
        prediction = model.apply(trained, img, train=False)
        return decode_fn(prediction)

    def f32_pipeline(frames_uint8):
        img = frames_uint8.astype(jnp.float32) / 255.0
        prediction = model_f32.apply(trained, img, train=False)
        return decode_fn(prediction)

    model_bn16 = dataclasses.replace(
        model, bn_out=jnp.bfloat16, parent=None, name=None
    )

    def bn16_pipeline(frames_uint8):
        img = frames_uint8.astype(jnp.bfloat16) / 255.0
        prediction = model_bn16.apply(trained, img, train=False)
        return decode_fn(prediction)

    eval_rng = np.random.default_rng(1007)
    eval_sets = [
        generate_square_batch(eval_rng, args.batch_size, square_cfg)
        for _ in range(args.eval_batches)
    ]
    eval_frames = [
        jnp.asarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        for img, _ in eval_sets
    ]

    def collect(fn):
        out = []
        for frames in eval_frames:
            d = fn(frames)
            if args.keypoints:
                out.append(jax.tree_util.tree_map(np.asarray, d))
                continue
            out.extend(detections_from_arrays(
                np.asarray(d.valid), np.asarray(d.score),
                np.asarray(d.label), np.asarray(d.y), np.asarray(d.x),
                np.asarray(d.h), np.asarray(d.w),
            ))
        return out

    def pair_deltas_kp(dets_a, dets_b):
        """Keypoint-pipeline agreement: greedy same-label center match
        on the parent detections, then per matched pair compare every
        keypoint slot both sides decoded (position, score) plus the
        parent score/center/size — the full centernet-node output
        surface (centernet_node.py:106-116) minus PnP (4 corner
        keypoints < the 6-keypoint PnP gate)."""
        kc_d, ks_d, center_d, score_d, size_d = [], [], [], [], []
        matched = total = kp_total = kp_matched = 0
        for da, db in zip(dets_a, dets_b):
            pa, pb = da.detections, db.detections
            for b in range(pa.valid.shape[0]):
                ia = [i for i in range(pa.valid.shape[1]) if pa.valid[b, i]]
                ib = [j for j in range(pb.valid.shape[1]) if pb.valid[b, j]]
                total += len(ia)
                used = set()
                for i in ia:
                    best, best_dist = None, 0.05
                    for j in ib:
                        if j in used or pa.label[b, i] != pb.label[b, j]:
                            continue
                        dist = float(
                            (pa.y[b, i] - pb.y[b, j]) ** 2
                            + (pa.x[b, i] - pb.x[b, j]) ** 2
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
                        abs(float(pa.score[b, i]) - float(pb.score[b, j]))
                    )
                    size_d.append(max(
                        abs(float(pa.h[b, i] - pb.h[b, j])),
                        abs(float(pa.w[b, i] - pb.w[b, j])),
                    ))
                    for sl in range(da.keypoint_valid.shape[2]):
                        va = bool(da.keypoint_valid[b, i, sl])
                        vb = bool(db.keypoint_valid[b, j, sl])
                        kp_total += int(va)
                        if not (va and vb):
                            continue
                        kp_matched += 1
                        kc_d.append(float(
                            (da.keypoint_y[b, i, sl]
                             - db.keypoint_y[b, j, sl]) ** 2
                            + (da.keypoint_x[b, i, sl]
                               - db.keypoint_x[b, j, sl]) ** 2
                        ) ** 0.5)
                        ks_d.append(abs(
                            float(da.keypoint_score[b, i, sl])
                            - float(db.keypoint_score[b, j, sl])
                        ))
        stats = {
            "total": total,
            "matched_fraction": round(matched / max(total, 1), 4),
            "kp_total": kp_total,
            "kp_matched_fraction": round(kp_matched / max(kp_total, 1), 4),
        }
        for vals, what in ((center_d, "center"), (score_d, "score"),
                           (size_d, "size"), (kc_d, "kp_center"),
                           (ks_d, "kp_score")):
            if not vals:
                continue
            for pct in (50, 95):
                stats[f"{what}_delta_p{pct}"] = round(
                    float(np.percentile(vals, pct)), 6
                )
            stats[f"{what}_delta_max"] = round(float(np.max(vals)), 6)
        if score_d and kc_d:
            stats["all_deltas_le_1e3"] = bool(
                np.percentile(score_d, 95) <= 1e-3
                and np.percentile(center_d, 95) <= 1e-3
                and np.percentile(size_d, 95) <= 1e-3
                and np.percentile(kc_d, 95) <= 1e-3
                and np.percentile(ks_d, 95) <= 1e-3
            )
        return stats

    def pair_deltas(dets_a, dets_b):
        """Greedy same-label nearest matching of decoded detections;
        returns agreement stats (the decoded-parity evidence)."""
        center_deltas, score_deltas, size_deltas = [], [], []
        matched, total = 0, 0
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
                    q = di[best]
                    center_deltas.append(best_dist)
                    score_deltas.append(abs(d.score - q.score))
                    size_deltas.append(max(abs(d.h - q.h), abs(d.w - q.w)))

        stats = {
            "total": total,
            "matched_fraction": round(matched / max(total, 1), 4),
        }
        for vals, what in ((center_deltas, "center"),
                           (score_deltas, "score"),
                           (size_deltas, "size")):
            if not vals:
                continue
            for p in (50, 95):
                stats[f"{what}_delta_p{p}"] = round(
                    float(np.percentile(vals, p)), 6
                )
            stats[f"{what}_delta_max"] = round(float(np.max(vals)), 6)
        if score_deltas:
            stats["all_deltas_le_1e3"] = bool(
                np.percentile(score_deltas, 95) <= 1e-3
                and np.percentile(center_deltas, 95) <= 1e-3
                and np.percentile(size_deltas, 95) <= 1e-3
            )
        return stats

    baseline_pipeline = (
        f32_pipeline if args.baseline == "f32" else raw_pipeline
    )
    print(f"decoding {args.baseline} reference...", flush=True)
    dets_bf16 = collect(jax.jit(baseline_pipeline))
    truths = []
    for _, truth in eval_sets:
        truths.extend(truths_from_batch(truth))

    cal_frames = [f[:4] for f in eval_frames[: args.cal_batches]]

    from tauv_vision_tpu.serving.quantize_chain import (
        calibrate_sequential,
        dla34_chain_forward,
    )

    def make_chain_fn(scales, corrections=None, gains=None, ranges=None,
                      wq_override=None, variables=None, f32_paths=()):
        chain_forward = dla34_chain_forward(
            object_config, variables if variables is not None else trained,
            scales, corrections=corrections,
            gains=gains, ranges=ranges, wq_override=wq_override,
            f32_paths=f32_paths,
        )

        def chain_pipeline(frames_uint8):
            img = frames_uint8.astype(jnp.bfloat16) / 255.0
            return decode_fn(chain_forward(img))

        return jax.jit(chain_pipeline)

    def seq_calibrate(scales, mode):
        def build_forward(ctx):
            forward = dla34_chain_forward(object_config, trained, scales,
                                          ctx=ctx)
            return lambda f: forward(f.astype(jnp.bfloat16) / 255.0)

        batch = jnp.concatenate(cal_frames, axis=0)
        return calibrate_sequential(build_forward, trained, scales, batch,
                                    mode=mode)

    if args.qat_steps or args.qat_load:
        import pickle

        from tauv_vision_tpu.serving.qat import qat_distill

        strip = tuple(s for s in args.qat_strip.split(",") if s)
        print(f"calibrating per-channel scales (bf16 tail: {strip})...",
              flush=True)
        scales = strip_scales(
            calibrate(raw_pipeline, cal_frames, per_channel=True), strip
        )

        if args.qat_load:
            with open(args.qat_load, "rb") as fp:
                qat_vars = jax.tree_util.tree_map(
                    jnp.asarray, pickle.load(fp)
                )
            print(f"loaded QAT variables from {args.qat_load}", flush=True)
        else:
            qat_rng = np.random.default_rng(2027)

            def qat_batches():
                while True:
                    img, _ = generate_square_batch(
                        qat_rng, args.batch_size, square_cfg
                    )
                    frames = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                    yield jnp.asarray(frames).astype(jnp.float32) / 255.0

            print(f"QAT distillation: {args.qat_steps} steps, "
                  f"{len(scales)} int8 convs, lr {args.qat_lr}...",
                  flush=True)
            qat_vars = qat_distill(
                model, trained, scales, qat_batches(),
                steps=args.qat_steps, lr=args.qat_lr,
                leaf_weights={"size": args.qat_size_weight},
            )
            if args.qat_save:
                host = jax.tree_util.tree_map(np.asarray, qat_vars)
                with open(args.qat_save, "wb") as fp:
                    pickle.dump(host, fp)
                print(f"saved QAT variables to {args.qat_save}", flush=True)

        print(f"evaluating QAT chain ({len(scales)} int8 convs) vs "
              "ORIGINAL bf16 baseline...", flush=True)
        dets_qat = collect(make_chain_fn(scales, variables=qat_vars))
        stats = (pair_deltas_kp if args.keypoints else pair_deltas)(
            dets_bf16, dets_qat
        )
        result = {
            "mode": "qat",
            "qat_steps": args.qat_steps,
            "qat_lr": args.qat_lr,
            "qat_strip": strip,
            "int8_convs": len(scales),
            "n_eval_samples": len(truths),
            **stats,
        }
        if not args.keypoints:
            from tauv_vision_tpu.eval.detection_eval import (
                average_precision,
                iou_match,
                precision_recall_curve,
            )

            def ap_of(dets):
                _, precision, recall = precision_recall_curve(
                    dets, truths, iou_match(0.5)
                )
                return round(average_precision(precision, recall), 4)

            result["bf16_ap_iou0.5"] = ap_of(dets_bf16)
            result["qat_int8_ap_iou0.5"] = ap_of(dets_qat)
        print(json.dumps(result, indent=2))
        if args.out:
            with open(args.out, "w") as fp:
                json.dump(result, fp, indent=2)
        return result

    if args.early_pack:
        g = args.early_pack
        model_pack = CenterpointDLA34(
            object_config=object_config, dtype=jnp.bfloat16, deform=False,
            early_pack=g,
        )

        def pack_pipeline(frames_uint8):
            img = frames_uint8.astype(jnp.bfloat16) / 255.0
            prediction = model_pack.apply(trained, img, train=False)
            return decode_fn(prediction)

        print(f"decoding early-pack g={g} bf16 vs unpacked bf16...",
              flush=True)
        dets_pack = collect(jax.jit(pack_pipeline))
        stats = (pair_deltas_kp if args.keypoints else pair_deltas)(
            dets_bf16, dets_pack
        )
        result = {
            "mode": "early_pack",
            "early_pack": g,
            "n_eval_samples": len(truths),
            **stats,
        }
        print(json.dumps(result, indent=2))
        if args.out:
            with open(args.out, "w") as fp:
                json.dump(result, fp, indent=2)
        return result

    if args.sweep:
        return _run_sweep(
            args, raw_pipeline, cal_frames, make_chain_fn, collect,
            pair_deltas_kp if args.keypoints else pair_deltas,
            dets_bf16, truths, seq_calibrate=seq_calibrate,
            bn16_pipeline=bn16_pipeline,
        )

    print("calibrating int8...", flush=True)
    scales = calibrate(
        raw_pipeline, cal_frames, percentile=args.percentile,
        per_channel=args.per_channel,
    )
    if args.bf16_heads:
        scales = strip_scales(scales, ("head_",))
    corrections = None
    if args.bias_correct:
        print("computing bias corrections...", flush=True)
        corrections = calibrate_bias_correction(
            raw_pipeline, cal_frames, scales
        )
    int8_fn = jax.jit(quantized_call(raw_pipeline, scales))
    chain_fn = make_chain_fn(scales, corrections)

    print("decoding int8 (per-layer + chain)...", flush=True)
    dets_int8 = collect(int8_fn)
    dets_chain = collect(chain_fn)

    result = {
        "steps": args.steps,
        "quantized_convs": len(scales),
        "percentile": args.percentile,
        "per_channel": args.per_channel,
        "bias_correct": args.bias_correct,
        "bf16_heads": args.bf16_heads,
        "n_eval_samples": len(truths),
    }

    def ap_of(indices, dets):
        _, precision, recall = precision_recall_curve(
            [dets[i] for i in indices], [truths[i] for i in indices],
            iou_match(0.5),
        )
        return average_precision(precision, recall)

    boot_rng = np.random.default_rng(42)
    all_idx = list(range(len(truths)))
    for name, dets in (("bf16", dets_bf16), ("int8", dets_int8),
                       ("int8_chain", dets_chain)):
        result[f"{name}_ap_iou0.5"] = round(ap_of(all_idx, dets), 4)
        if args.bootstrap:
            # Bootstrap over images: AP is a function of the image set,
            # so resampling images (not detections) gives the sampling
            # distribution of the reported AP.
            aps = [
                ap_of(
                    boot_rng.integers(0, len(truths), len(truths)), dets
                )
                for _ in range(args.bootstrap)
            ]
            result[f"{name}_ap_ci95"] = [
                round(float(np.percentile(aps, 2.5)), 4),
                round(float(np.percentile(aps, 97.5)), 4),
            ]

    def agreement(dets_a, dets_b, tag):
        stats = pair_deltas(dets_a, dets_b)
        result["bf16_detections"] = stats.pop("total")
        for k, v in stats.items():
            result[f"{tag}_{k}"] = v

    agreement(dets_bf16, dets_int8, "int8")
    agreement(dets_bf16, dets_chain, "int8_chain")
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(result, fp, indent=2)
    return result


if __name__ == "__main__":
    main()
