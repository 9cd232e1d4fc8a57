"""DCN offset-range evidence: train the production DCN DLA-34 on
synthetic squares with and without offset-range regularization
(CenternetTrainConfig.loss_lambda_dcn_offset) and report the learned
|offset| distribution.

The serving Pallas/shift DCN kernels (ops/pallas/deform_conv.py) are
exact for |offset| <= R; this script is the evidence that regularized
training keeps offsets inside R=1, making the fast R=1 serving config
exact in practice rather than a clamp (reference DCN:
/root/reference/src/tauv_vision/centernet/model/backbones/centerpoint_dla.py:360-392).

Run on the chip (~2x the quantize_accuracy_check training time — the
gather-DCN train step is heavier than plain conv):

  python -m tauv_vision_tpu.scripts.dcn_offset_stats --steps 200 \
      --out /tmp/dcn_offsets.json
"""

from __future__ import annotations

import argparse
import json
from math import pi

import numpy as np

IN_H, IN_W = 360, 640


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--lambda-dcn", type=float, default=1.0)
    parser.add_argument("--offset-range", type=float, default=1.0)
    parser.add_argument("--eval-batches", type=int, default=2)
    parser.add_argument("--skip-unregularized", action="store_true")
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
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
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
    square_cfg = SquareDatasetConfig(
        in_h=IN_H, in_w=IN_W, max_objects=4, min_side=24, max_side=96,
        rotate=False,
    )

    # Train with the gather DCN (unbounded offsets, torchvision-exact):
    # the regularizer must constrain offsets the model could otherwise
    # use, not offsets a bounded kernel already clamps.
    model = CenterpointDLA34(
        object_config=object_config, dtype=jnp.bfloat16, deform=True,
        dcn_impl="gather",
    )

    def offset_stats(state, eval_imgs):
        vs = {"params": state.params}
        if state.batch_stats is not None:
            vs["batch_stats"] = state.batch_stats

        @jax.jit
        def sown(img):
            _, mutated = model.apply(
                vs, img, train=False, mutable=["intermediates"]
            )
            leaves = [
                leaf
                for path, leaf in jax.tree_util.tree_flatten_with_path(
                    mutated["intermediates"]
                )[0]
                if "dcn_offset" in jax.tree_util.keystr(path)
            ]
            return jnp.concatenate(
                [jnp.abs(o.astype(jnp.float32)).reshape(-1) for o in leaves]
            )

        mags = np.concatenate([np.asarray(sown(img)) for img in eval_imgs])
        return {
            "p50": round(float(np.percentile(mags, 50)), 4),
            "p95": round(float(np.percentile(mags, 95)), 4),
            "p99": round(float(np.percentile(mags, 99)), 4),
            "p999": round(float(np.percentile(mags, 99.9)), 4),
            "max": round(float(mags.max()), 4),
            "frac_le_1": round(float((mags <= 1.0).mean()), 6),
            "n": int(mags.size),
        }

    def train(lam):
        train_config = CenternetTrainConfig(
            lr=args.lr, batch_size=args.batch_size, n_batches=0, n_epochs=1,
            heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
            heatmap_sigma_factor=0.1, keypoint_heatmap_sigma=2.0,
            keypoint_affinity_sigma=2.0, loss_lambda_keypoint_heatmap=1.0,
            loss_lambda_keypoint_affinity=1.0, loss_lambda_size=0.1,
            loss_lambda_offset=1.0, loss_lambda_angle=1.0,
            loss_lambda_depth=1.0, max_objects=4, max_keypoints=4,
            loss_lambda_dcn_offset=lam,
            dcn_offset_range=args.offset_range,
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
        final_loss = None
        for step in range(args.steps):
            img, truth = generate_square_batch(rng, args.batch_size,
                                               square_cfg)
            truth = jax.tree_util.tree_map(jnp.asarray, truth)
            state, losses = step_fn(state, jnp.asarray(img), truth)
            if step % 25 == 0 or step == args.steps - 1:
                final_loss = float(losses.total)
                print(
                    f"lam={lam} step {step}: total={final_loss:.4f} "
                    f"dcn_offset={float(losses.dcn_offset):.6f}",
                    flush=True,
                )
        return state, final_loss

    eval_rng = np.random.default_rng(1007)
    eval_imgs = [
        jnp.asarray(generate_square_batch(eval_rng, args.batch_size,
                                          square_cfg)[0])
        for _ in range(args.eval_batches)
    ]

    result = {
        "steps": args.steps,
        "lambda_dcn": args.lambda_dcn,
        "offset_range": args.offset_range,
    }
    print("training regularized DCN DLA-34...", flush=True)
    state_reg, loss_reg = train(args.lambda_dcn)
    result["regularized"] = offset_stats(state_reg, eval_imgs)
    result["regularized"]["final_loss"] = loss_reg
    if not args.skip_unregularized:
        print("training unregularized DCN DLA-34...", flush=True)
        state_plain, loss_plain = train(0.0)
        result["unregularized"] = offset_stats(state_plain, eval_imgs)
        result["unregularized"]["final_loss"] = loss_plain

    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(result, fp, indent=2)
    return result


if __name__ == "__main__":
    main()
