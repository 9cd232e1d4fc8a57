"""YOLACT shared-weights transplant parity: the torch reference graph
vs the TPU rebuild, decoded END-TO-END on one set of trained weights
(the YOLACT leg of VERDICT r4 item 1).

ONE set of weights — trained in the rebuild at the production serving
architecture (ResNet-18 trunk, FPN, 8-prototype protonet, shared head,
360x640) — runs through

  (t) the torch reference graph + its own decode
      (model.py:18-60 forward; box_decode -> nms -> assemble_mask,
      evaluate_batch.py:86-101), weights delivered via
      ``export_yolact_state_dict`` (round-trip-exact vs
      ``load_yolact_state_dict``, tests/test_yolact_import.py);
  (a) the rebuild's f32 pipeline (model + decode_yolact);
  (b) the EXACT served north-star YOLACT graph: chain-int8
      pc+outputs+head rung with bf16 joins (bench.py --parity-int8 +
      join16 — the north-star profile's YOLACT side).

and the decoded deltas of (a)/(b) are measured DIRECTLY against (t) on
512 shared uint8 eval frames: boxes, scores, labels, and sigmoid masks
at the prototype resolution (yolact_parity_check.pair_deltas format).

The training direction is rebuild->torch (the CenterNet leg,
scripts/transplant_parity.py, trains torch->rebuild): torch CPU
training at the production scale is infeasible on this 1-core host,
and the parity statement — both stacks decode the same weights to the
same detections — is direction-free.

  python -m tauv_vision_tpu.scripts.transplant_parity_yolact \
      --steps 300 --out /tmp/yolact_transplant.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np

IN_H, IN_W = 360, 640
TOP_K = 20
IOU_NMS = 0.5
CONF = 0.5


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--eval-images", type=int, default=512)
    parser.add_argument("--eval-batch", type=int, default=8)
    parser.add_argument("--cal-frames", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--save-model", default=None)
    parser.add_argument("--load-model", default=None)
    parser.add_argument("--skip-served", action="store_true")
    parser.add_argument("--out", default=None)
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
    from tauv_vision_tpu.models.yolact import (
        Yolact,
        export_yolact_state_dict,
    )
    from tauv_vision_tpu.scripts.yolact_parity_check import pair_deltas
    from tauv_vision_tpu.serving.quantize import calibrate, strip_scales
    from tauv_vision_tpu.serving.quantize_chain import yolact_chain_forward
    from tauv_vision_tpu.serving.yolact_decode import decode_yolact
    from tauv_vision_tpu.train import (
        TrainState,
        adam_with_clip,
        make_yolact_train_step,
    )
    from tauv_vision_tpu.train.yolact_task import YolactTruth

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

    # ---- weights: train in the rebuild (TPU) or load ------------------
    if args.load_model:
        import pickle

        with open(args.load_model, "rb") as fp:
            trained = pickle.load(fp)
        trained = jax.tree_util.tree_map(jnp.asarray, trained)
        print(f"loaded {args.load_model}", flush=True)
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

    # ---- shared eval frames ------------------------------------------
    eval_rng = np.random.default_rng(2024)
    eval_frames = []
    for _ in range(args.eval_images // args.eval_batch):
        img, _ = generate_square_seg_batch(
            eval_rng, args.eval_batch, square_cfg
        )
        eval_frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))

    # ---- (t): torch reference on exported weights --------------------
    import torch

    from tauv_vision_tpu.scripts.compare_reference_yolact import (
        _model_kwargs as _harness_kwargs,  # noqa: F401 (env setup import)
        install_yolact_torch_env,
    )

    ref_model_mod = install_yolact_torch_env()
    from tauv_vision.yolact.model.boxes import box_decode as ref_box_decode
    from tauv_vision.yolact.model.config import ModelConfig as RefModelConfig
    from tauv_vision.yolact.model.masks import (
        assemble_mask as ref_assemble_mask,
    )
    from tauv_vision.yolact.model.nms import nms as ref_nms

    ref_config = RefModelConfig(
        img_mean=(0.0, 0.0, 0.0), img_stddev=(1.0, 1.0, 1.0),
        in_w=IN_W, in_h=IN_H, feature_depth=256, n_classes=1,
        n_prototype_masks=8,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0,
        n_box_layers=0, n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.4,
        iou_neg_threshold=0.3, negative_example_ratio=3,
    )
    torch.manual_seed(0)
    ref = ref_model_mod.Yolact(ref_config)
    exported = export_yolact_state_dict(
        jax.tree_util.tree_map(np.asarray, trained)
    )
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in exported.items()},
        strict=True,
    )
    assert not missing and not unexpected, (missing, unexpected)
    ref.eval()

    class _Bag:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    def torch_decode_batch(frames):
        """Reference forward + decode per image (nms is batch-1 only),
        padded into the YolactDetections layout."""
        bsz = frames.shape[0]
        valid = np.zeros((bsz, TOP_K), bool)
        score = np.zeros((bsz, TOP_K), np.float32)
        label = np.zeros((bsz, TOP_K), np.int32)
        box = np.zeros((bsz, TOP_K, 4), np.float32)
        mask = None
        img_t = torch.from_numpy(
            np.moveaxis(frames.astype(np.float32) / 255.0, -1, 1)
        ).contiguous()
        with torch.no_grad():
            for b in range(bsz):
                cls, box_enc, coeff, anchor, proto = ref(img_t[b:b + 1])
                decoded = ref_box_decode(box_enc, anchor, ref_config)
                det = ref_nms(cls, decoded, TOP_K, IOU_NMS, CONF)
                n = int(det.numel())
                if mask is None:
                    mask = np.zeros(
                        (bsz, TOP_K, proto.shape[2], proto.shape[3]),
                        np.float32,
                    )
                if n == 0:
                    continue
                boxes = decoded[0, det]
                conf = torch.softmax(cls[0, det], dim=-1)
                score[b, :n] = conf[:, 1:].max(dim=-1).values.numpy()
                label[b, :n] = (
                    conf[:, 1:].argmax(dim=-1).numpy().astype(np.int32) + 1
                )
                box[b, :n] = boxes.numpy()
                valid[b, :n] = True
                mask[b, :n] = ref_assemble_mask(
                    proto[0], coeff[0, det], boxes
                ).numpy()
        return _Bag(valid=valid, score=score, label=label, box=box,
                    mask=mask)

    # ---- rebuild legs -------------------------------------------------
    model_f32 = Yolact(model_config, dtype=jnp.float32)

    @jax.jit
    def f32_pipeline(frames_uint8):
        img = frames_uint8.astype(jnp.float32) / 255.0
        return decode_yolact(model_f32.apply(trained, img, train=False),
                             model_config, top_k=TOP_K,
                             iou_threshold=IOU_NMS,
                             confidence_threshold=CONF)

    def collect(fn):
        out = []
        for frames in eval_frames:
            out.append(jax.tree_util.tree_map(
                np.asarray, fn(jnp.asarray(frames))
            ))
        return out

    legs = {}
    print("decoding rebuild f32 leg...", flush=True)
    legs["f32"] = collect(f32_pipeline)

    if not args.skip_served:
        # The served north-star YOLACT rung: per-channel int8 chain,
        # prediction head + protonet output in bf16, bf16 joins.
        def raw_forward(frames_uint8):
            img = frames_uint8.astype(jnp.bfloat16) / 255.0
            return model.apply(trained, img, train=False)

        print("calibrating served rung...", flush=True)
        cal = [jnp.asarray(eval_frames[0][: args.cal_frames])]
        scales = strip_scales(
            calibrate(raw_forward, cal, per_channel=True),
            ("prediction_head", "protonet/output"),
        )
        fwd = yolact_chain_forward(
            model_config, trained, scales, join_dtype=jnp.bfloat16,
        )

        @jax.jit
        def served_pipeline(frames_uint8):
            img = frames_uint8.astype(jnp.bfloat16) / 255.0
            return decode_yolact(fwd(img), model_config, top_k=TOP_K,
                                 iou_threshold=IOU_NMS,
                                 confidence_threshold=CONF)

        print("decoding served rung...", flush=True)
        legs["served"] = collect(served_pipeline)

    print("decoding torch reference (CPU, slow)...", flush=True)
    torch_dets = []
    for i, frames in enumerate(eval_frames):
        torch_dets.append(torch_decode_batch(frames))
        if i % 8 == 0:
            print(f"  torch batch {i}/{len(eval_frames)}", flush=True)

    result = {"eval_images": args.eval_images}
    for name, dets in legs.items():
        stats = pair_deltas(torch_dets, dets)
        result[name] = stats
        print(f"[yolact/{name} vs torch] " + json.dumps(stats), flush=True)

    if args.out:
        with open(args.out, "w") as fp:
            json.dump(result, fp, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
