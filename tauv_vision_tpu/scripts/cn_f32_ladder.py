"""f32-from-level-K serving ladder for the CenterNet bf16 path
(VERDICT r4 item 2).

The served north-star CN graph (bf16 convs + bf16 BN outputs) certifies
geometry at p95 7.5e-5 but score/size sit at 2.5-2.8e-3 vs the f32
flow — above BASELINE's 1e-3 decoded-parity bar.  Earlier attacks were
all-or-nothing (all-f32 trunk: rejected on throughput; f32 head convs
alone: moved score 2.25e-3 -> 2.22e-3).  This ladder upcasts the chain
to f32 PROGRESSIVELY FROM THE HEAD BACKWARDS (heads -> ida_up ->
dla_up -> level5 -> ...) using the model's ``f32_stages`` knob and
measures, per rung:

  - decoded deltas vs the f32 pipeline on 512 shared eval images
    (decoded_pair_deltas format, the PARITY.md convention), and
  - serving throughput (chained-scan fps at batch 128, 480x640 uint8
    frames -> on-device resize -> model -> decode, serving compiler
    options — the CN side of the north-star graph).

"Done" is either a rung with ALL decoded p95 <= 1e-3 at acceptable
throughput (then it becomes the served default) or the full fps-vs-
delta frontier recorded in BENCH.md.

  python -m tauv_vision_tpu.scripts.cn_f32_ladder \
      --steps 300 --save-model /tmp/ladder_model.pkl
  python -m tauv_vision_tpu.scripts.cn_f32_ladder \
      --load-model /tmp/ladder_model.pkl --rungs f32-dlaup,f32-lvl5
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from math import pi

import numpy as np

IN_H, IN_W = 360, 640
BENCH_H, BENCH_W = 480, 640

# Cumulative head-backwards rungs.  "bn16" is the served default
# (baseline anchor); "all-f32" equals the f32 flow by construction
# (methodology anchor: its deltas must be ~0).
RUNGS = (
    ("bn16", ()),
    ("f32-heads", ("heads",)),
    ("f32-idaup", ("heads", "ida_up")),
    ("f32-dlaup", ("heads", "ida_up", "dla_up")),
    ("f32-lvl5", ("heads", "ida_up", "dla_up", "level5")),
    ("f32-lvl45", ("heads", "ida_up", "dla_up", "level5", "level4")),
    ("f32-lvl345",
     ("heads", "ida_up", "dla_up", "level5", "level4", "level3")),
    ("all-f32",
     ("heads", "ida_up", "dla_up", "level5", "level4", "level3",
      "level2", "early")),
    # Round-5 second ladder: the head-backwards rungs all sit at the
    # bn16 deltas and only all-f32 collapses to 0 — the entire
    # score/size delta originates in the EARLY trunk (stem/level0/
    # level1 bf16 + the bf16 input cast).  Walk forward from the input
    # instead (the "early"-alias rungs; input cast follows the stem).
    ("f32-stem", ("stem",)),
    ("f32-stem0", ("stem", "level0")),
    ("f32-early", ("early",)),
    ("f32-early2", ("early", "level2")),
    ("f32-early23", ("early", "level2", "level3")),
    # Frontier-completion rungs: early + the aggregation tail (trees
    # stay bf16), and the full-trunk complement (tail stays bf16).
    ("f32-early-tail", ("early", "dla_up", "ida_up", "heads")),
    ("f32-trunk", ("early", "level2", "level3", "level4", "level5")),
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--eval-images", type=int, default=512)
    parser.add_argument("--bench-batch", type=int, default=128)
    parser.add_argument("--rungs", default=None,
                        help="comma-separated rung names (default: all)")
    parser.add_argument("--no-fps", action="store_true",
                        help="skip throughput timing (deltas only)")
    parser.add_argument("--save-model", default=None)
    parser.add_argument("--load-model", default=None)
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
        decoded_pair_deltas,
        detections_from_arrays,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
    from tauv_vision_tpu.serving.centernet_decode import decode
    from tauv_vision_tpu.serving.compiler import serving_compiler_options
    from tauv_vision_tpu.serving.pipeline import make_centernet_pipeline
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
        in_h=IN_H, in_w=IN_W, backbone_heights=(2, 2, 2, 2, 2),
        backbone_channels=(128,) * 6, downsamples=2,
        angle_bin_overlap=pi / 3,
    )
    square_cfg = SquareDatasetConfig(
        in_h=IN_H, in_w=IN_W, max_objects=4, min_side=24, max_side=96,
        rotate=False,
    )

    model_bf16 = CenterpointDLA34(
        object_config=object_config, dtype=jnp.bfloat16, deform=False
    )

    if args.load_model:
        import pickle

        with open(args.load_model, "rb") as fp:
            trained = pickle.load(fp)
        trained = jax.tree_util.tree_map(jnp.asarray, trained)
        print(f"loaded {args.load_model}", flush=True)
    else:
        train_config = CenternetTrainConfig(
            lr=args.lr, batch_size=args.batch_size, n_batches=0,
            n_epochs=1, heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
            heatmap_sigma_factor=0.1, keypoint_heatmap_sigma=2.0,
            keypoint_affinity_sigma=2.0, loss_lambda_keypoint_heatmap=1.0,
            loss_lambda_keypoint_affinity=1.0, loss_lambda_size=0.1,
            loss_lambda_offset=1.0, loss_lambda_angle=1.0,
            loss_lambda_depth=1.0, max_objects=4, max_keypoints=4,
        )
        img0 = jnp.zeros((1, IN_H, IN_W, 3), jnp.float32)
        variables = jax.jit(
            lambda k: model_bf16.init(k, img0, train=False)
        )(jax.random.key(0))
        state = TrainState.create(
            apply_fn=model_bf16.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=adam_with_clip(args.lr, 1.0),
        )
        step_fn = make_centernet_train_step(
            model_bf16, model_config, train_config, object_config
        )
        rng = np.random.default_rng(7)
        print("training DLA-34 on synthetic squares...", flush=True)
        for step in range(args.steps):
            img, truth = generate_square_batch(rng, args.batch_size,
                                               square_cfg)
            truth = jax.tree_util.tree_map(jnp.asarray, truth)
            state, losses = step_fn(state, jnp.asarray(img), truth)
            if step % 50 == 0:
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
            print(f"saved {args.save_model}", flush=True)

    # Eval data: native 360x640 uint8 (no resize, quantize_accuracy_check
    # convention) for the delta legs.
    eval_rng = np.random.default_rng(1007)
    eval_frames = []
    n_batches = args.eval_images // args.batch_size
    for _ in range(n_batches):
        img, _ = generate_square_batch(eval_rng, args.batch_size,
                                       square_cfg)
        eval_frames.append(
            jnp.asarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        )

    def make_model(f32_stages):
        return dataclasses.replace(
            model_bf16, bn_out=jnp.bfloat16, f32_stages=tuple(f32_stages),
            parent=None, name=None,
        )

    def make_delta_pipeline(model):
        # Input cast follows the stem's dtype (the all-f32 anchor must
        # reproduce the f32 pipe exactly, including the input).
        in_dtype = (
            jnp.float32
            if {"early", "stem"} & set(model.f32_stages) else model.dtype
        )

        @jax.jit
        def pipe(frames_uint8):
            img = frames_uint8.astype(in_dtype) / 255.0
            prediction = model.apply(trained, img, train=False)
            return decode(prediction, model_config, 10, 0.3)

        return pipe

    model_f32 = dataclasses.replace(
        model_bf16, dtype=jnp.float32, parent=None, name=None
    )

    @jax.jit
    def f32_pipe(frames_uint8):
        img = frames_uint8.astype(jnp.float32) / 255.0
        prediction = model_f32.apply(trained, img, train=False)
        return decode(prediction, model_config, 10, 0.3)

    def collect(pipe):
        out = []
        for frames in eval_frames:
            d = pipe(frames)
            out.extend(detections_from_arrays(
                np.asarray(d.valid), np.asarray(d.score),
                np.asarray(d.label), np.asarray(d.y), np.asarray(d.x),
                np.asarray(d.h), np.asarray(d.w),
            ))
        return out

    print("decoding f32 reference...", flush=True)
    dets_f32 = collect(f32_pipe)

    def time_rung(model):
        """CN-side serving fps: bench.py's chained N-vs-2N methodology
        on make_centernet_pipeline with serving compiler options."""
        pipeline = make_centernet_pipeline(
            model, model_config, n_detections=10, score_threshold=0.6,
            jit=False,
        )
        jitted = jax.jit(
            lambda v, f, n: _chain(pipeline, v, f, n),
            static_argnums=2,
            compiler_options=serving_compiler_options(),
        )

        def _chain(pipe, v, f, n):
            def body(carry, _):
                out = pipe(v, f + carry)
                total = sum(
                    leaf.astype(jnp.float32).sum()
                    for leaf in jax.tree_util.tree_leaves(out)
                )
                tiny = (total.astype(jnp.int32) % 2).astype(f.dtype)
                return tiny, total
            _, totals = jax.lax.scan(
                body, jnp.zeros((), f.dtype), None, length=n
            )
            return totals.sum()

        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.integers(
            0, 256, (args.bench_batch, BENCH_H, BENCH_W, 3),
            dtype=np.uint8,
        ))

        def run(n):
            float(jitted(trained, frames, n))
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                float(jitted(trained, frames, n))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t = max(run(12) - run(6), 1e-9) / 6
        return args.bench_batch / t

    selected = (
        {r.strip() for r in args.rungs.split(",")} if args.rungs else None
    )
    rows = []
    for name, stages in RUNGS:
        if selected is not None and name not in selected:
            continue
        model = make_model(stages)
        dets = collect(make_delta_pipeline(model))
        stats = decoded_pair_deltas(dets_f32, dets)
        row = {"rung": name, **stats}
        if not args.no_fps:
            row["cn_fps"] = round(time_rung(model), 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"eval_images": args.eval_images, "rows": rows}
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(out, fp, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
