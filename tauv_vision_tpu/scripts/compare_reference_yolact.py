"""Comparative accuracy: reference torch YOLACT vs the TPU rebuild,
trained on IDENTICAL synthetic segmentation data, evaluated head-to-head
on box AP and mask IoU (VERDICT r2 item 3).

This is the YOLACT counterpart of compare_reference_accuracy.py: the
OHEM + mask-assembly loss (reference yolact/model/loss.py:8-124) is the
most intricate port in the framework, and this harness converts "the
losses match on fixed tensors" (tests/test_reference_parity.py) into
"training both stacks converges to the same task accuracy".

Setup parity:
- identical data: axis-aligned colored squares + instance seg maps
  (data/synthetic.generate_square_seg_batch), same batches both sides;
- identical architecture: ResNet-18 trunk (random init — the reference's
  pretrained torchvision download is unavailable offline, so both sides
  start from scratch), FPN, protonet, shared prediction head, identical
  widths; the torch trunk restates torchvision's ResNet-18 exactly like
  the reference's feature extractor taps it (backbone.py:16-23);
- identical recipe: Adam + grad-clip 1.0 (train.py:252-257), same lr,
  batch size, and step count;
- each side decodes with its own path (reference box_decode -> nms ->
  assemble_mask, evaluate_batch.py:86-101; ours decode_yolact) and both
  are scored with the same matcher.

Metrics: box AP at IoU 0.5/0.3 (PR-sweep method, evaluate.py:211-233)
and mean mask IoU over box-matched detections (threshold 0.5, masks
upsampled to input resolution like the node, yolact_node.py:127-135).

Run (CPU, ~20 min):
  python -m tauv_vision_tpu.scripts.compare_reference_yolact \
      --steps 300 --out /tmp/compare_yolact.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from tauv_vision_tpu.scripts.compare_reference_accuracy import (
    _force_cpu,
    _install_reference_stubs,
)

IN_H = IN_W = 64
FEATURE_DEPTH = 32
N_PROTO = 8
ANCHOR_SCALES = (12, 24, 48, 96, 192)
TOP_K = 8
IOU_NMS = 0.5
CONF = 0.3


def _model_kwargs():
    return dict(
        in_w=IN_W, in_h=IN_H, feature_depth=FEATURE_DEPTH, n_classes=1,
        n_prototype_masks=N_PROTO, n_masknet_layers_pre_upsample=1,
        n_masknet_layers_post_upsample=1, n_prediction_head_layers=1,
        n_classification_layers=0, n_box_layers=0, n_mask_layers=0,
        n_fpn_downsample_layers=2, anchor_scales=ANCHOR_SCALES,
        anchor_aspect_ratios=(1.0,), box_variances=(0.1, 0.2),
        iou_pos_threshold=0.4, iou_neg_threshold=0.3,
        negative_example_ratio=3,
    )


def _make_data(n_train_batches, n_eval_batches, batch_size):
    from tauv_vision_tpu.data.synthetic import (
        SquareDatasetConfig,
        generate_square_seg_batch,
    )

    cfg = SquareDatasetConfig(in_h=IN_H, in_w=IN_W, max_objects=3,
                              min_side=12, max_side=28, rotate=False)
    rng = np.random.default_rng(42)
    train = [generate_square_seg_batch(rng, batch_size, cfg)
             for _ in range(n_train_batches)]
    eval_rng = np.random.default_rng(1042)
    evalb = [generate_square_seg_batch(eval_rng, batch_size, cfg)
             for _ in range(n_eval_batches)]
    return train, evalb


# ------------------------------------------------------ reference side


def _torch_resnet18_trunk():
    """torchvision ResNet-18 restated in plain torch (torchvision is not
    installed in this image), tapping layer{2,3,4}.1.bn2 pre-residual
    like the reference's feature extractor (backbone.py:21-23)."""
    import torch

    class BasicBlock(torch.nn.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=False):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(inplanes, planes, 3, stride, 1,
                                         bias=False)
            self.bn1 = torch.nn.BatchNorm2d(planes)
            self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1,
                                         bias=False)
            self.bn2 = torch.nn.BatchNorm2d(planes)
            self.downsample = None
            if downsample:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(inplanes, planes, 1, stride,
                                    bias=False),
                    torch.nn.BatchNorm2d(planes),
                )

        def forward(self, x):
            identity = x
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            tap = out
            if self.downsample is not None:
                identity = self.downsample(x)
            return torch.relu(out + identity), tap

    class Trunk(torch.nn.Module):
        def __init__(self, config=None):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
            self.layer1 = torch.nn.ModuleList(
                [BasicBlock(64, 64), BasicBlock(64, 64)])
            self.layer2 = torch.nn.ModuleList(
                [BasicBlock(64, 128, 2, True), BasicBlock(128, 128)])
            self.layer3 = torch.nn.ModuleList(
                [BasicBlock(128, 256, 2, True), BasicBlock(256, 256)])
            self.layer4 = torch.nn.ModuleList(
                [BasicBlock(256, 512, 2, True), BasicBlock(512, 512)])

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            taps = []
            for layer in (self.layer1, self.layer2, self.layer3,
                          self.layer4):
                x, _ = layer[0](x)
                x, tap = layer[1](x)
                taps.append(tap)
            return tuple(taps[1:])

        @property
        def depths(self):
            return (128, 256, 512)

    return Trunk


def install_yolact_torch_env():
    """Make the reference torch YOLACT importable offline: reference
    stubs + torchvision.feature_extraction / Bottleneck restatements +
    the same-architecture random-init trunk substituted for the
    hardcoded pretrained backbone ctor (model.py:25).  Returns the
    reference model module.  Shared by this harness and the
    full-import parity test (tests/test_yolact_import.py)."""
    import sys
    import types

    import torch

    _install_reference_stubs()
    # backbone.py also imports torchvision.models.feature_extraction;
    # extend the stub so the module imports (the backbone itself is then
    # replaced below).
    fe = types.ModuleType("torchvision.models.feature_extraction")
    fe.create_feature_extractor = lambda *a, **k: None
    sys.modules.setdefault("torchvision.models.feature_extraction", fe)
    sys.modules["torchvision.models"].feature_extraction = fe

    class Bottleneck(torch.nn.Module):
        """torchvision.models.resnet.Bottleneck restated (1x1-3x3-1x1,
        expansion 4, identity residual) — the reference prediction head
        instantiates it with planes = feature_depth // 4 so the residual
        shapes match without a downsample (prediction_head.py:16-18)."""

        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            width = planes
            self.conv1 = torch.nn.Conv2d(inplanes, width, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(width)
            self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1,
                                         bias=False)
            self.bn2 = torch.nn.BatchNorm2d(width)
            self.conv3 = torch.nn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(planes * 4)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return torch.relu(out + identity)

    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.Bottleneck = Bottleneck
    sys.modules.setdefault("torchvision.models.resnet", resnet_mod)
    sys.modules["torchvision.models"].resnet = resnet_mod
    import tauv_vision.yolact.model.model as ref_model_mod

    # The reference model hardcodes its torchvision-pretrained backbone
    # ctor (model.py:25); substitute the same-architecture random-init
    # trunk so both stacks train from scratch on the same data.
    ref_model_mod.Resnet101Backbone = _torch_resnet18_trunk()
    return ref_model_mod


def train_reference(train_batches, steps, lr, log_every):
    import torch

    ref_model_mod = install_yolact_torch_env()
    from tauv_vision.yolact.model.config import ModelConfig as RefModelConfig
    from tauv_vision.yolact.model.loss import loss as ref_loss
    from tauv_vision.yolact.model.weights import initialize_weights

    torch.manual_seed(0)

    config = RefModelConfig(
        img_mean=(0.0, 0.0, 0.0), img_stddev=(1.0, 1.0, 1.0),
        **_model_kwargs(),
    )
    model = ref_model_mod.Yolact(config)
    initialize_weights(model, [model._backbone])  # train.py:409
    optimizer = torch.optim.Adam(model.parameters(), lr=lr)

    def to_truth(fields):
        return (
            torch.from_numpy(fields["valid"]),
            torch.from_numpy(fields["classification"].astype(np.uint8)),
            torch.from_numpy(fields["box"]),
            torch.from_numpy(fields["seg"].astype(np.int64)),
            torch.from_numpy(fields["img_valid"]),
        )

    model.train()
    for step in range(steps):
        img, fields = train_batches[step % len(train_batches)]
        img_t = torch.from_numpy(np.moveaxis(img, -1, 1)).float()
        prediction = model(img_t)
        total, _ = ref_loss(prediction, to_truth(fields), config)
        optimizer.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optimizer.step()
        if step % log_every == 0:
            print(f"ref step {step}: total={float(total):.4f}", flush=True)
    model.eval()
    return model, config


def eval_reference(model, config, eval_batches):
    """Reference decode per sample (nms is batch-1 only, nms.py:14-25):
    box_decode -> fast-NMS -> assemble_mask -> bilinear upsample
    (evaluate_batch.py:86-101)."""
    import torch
    import torch.nn.functional as F

    from tauv_vision.yolact.model.boxes import box_decode
    from tauv_vision.yolact.model.masks import assemble_mask
    from tauv_vision.yolact.model.nms import nms

    out = []
    with torch.no_grad():
        for img, _ in eval_batches:
            img_t = torch.from_numpy(np.moveaxis(img, -1, 1)).float()
            for b in range(img_t.shape[0]):
                single = img_t[b: b + 1]
                classification, box_encoding, mask_coeff, anchor, proto = (
                    model(single)
                )
                box = box_decode(box_encoding, anchor, config)
                detection = nms(classification, box, TOP_K, IOU_NMS, CONF)
                boxes = box[0, detection]
                cls = torch.softmax(classification[0, detection], dim=-1)
                labels = torch.argmax(cls, dim=-1)
                scores = cls.gather(-1, labels[:, None])[:, 0]
                masks = None
                if labels.numel():
                    masks = assemble_mask(
                        proto[0], mask_coeff[0, detection], boxes
                    )
                    masks = F.interpolate(
                        masks.unsqueeze(0), (IN_H, IN_W), mode="bilinear"
                    )[0] > 0.5
                out.append({
                    "box": boxes.numpy() if boxes.numel() else
                    np.zeros((0, 4), np.float32),
                    "label": labels.numpy(),
                    "score": scores.numpy(),
                    "mask": masks.numpy() if masks is not None else
                    np.zeros((0, IN_H, IN_W), bool),
                })
    return out


# -------------------------------------------------------- rebuild side


def train_ours(train_batches, steps, lr, log_every):
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.configs import YolactModelConfig, YolactTrainConfig
    from tauv_vision_tpu.models.yolact import Yolact
    from tauv_vision_tpu.train import (
        TrainState,
        adam_with_clip,
        make_yolact_train_step,
    )
    from tauv_vision_tpu.train.yolact_task import YolactTruth

    model_config = YolactModelConfig(**_model_kwargs())
    max_objects = train_batches[0][1]["valid"].shape[1]
    train_config = YolactTrainConfig(
        lr=lr, momentum=0.9, weight_decay=0.0, grad_max_norm=1.0,
        n_epochs=1, batch_size=train_batches[0][0].shape[0],
        epoch_n_batches=1, max_objects=max_objects,
    )
    model = Yolact(model_config)
    img0 = jnp.zeros((1, IN_H, IN_W, 3))
    variables = model.init(jax.random.key(0), img0, train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(lr, 1.0),
    )
    step_fn = make_yolact_train_step(model, model_config, train_config)

    def to_truth(fields):
        return YolactTruth(
            valid=jnp.asarray(fields["valid"]),
            classification=jnp.asarray(fields["classification"]),
            box=jnp.asarray(fields["box"]),
            seg_map=jnp.asarray(fields["seg"].astype(np.int32)),
            img_valid=jnp.asarray(fields["img_valid"]),
        )

    for step in range(steps):
        img, fields = train_batches[step % len(train_batches)]
        state, losses = step_fn(state, jnp.asarray(img), to_truth(fields))
        if step % log_every == 0:
            print(f"ours step {step}: total={float(losses.total):.4f}",
                  flush=True)
    return model, model_config, state


def eval_ours(model, model_config, state, eval_batches):
    import jax
    import jax.numpy as jnp

    from tauv_vision_tpu.serving.yolact_decode import decode_yolact

    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def run(img):
        prediction = model.apply(variables, img, train=False)
        return decode_yolact(
            prediction, model_config, TOP_K, IOU_NMS, CONF,
            mask_hw=(IN_H, IN_W),
        )

    out = []
    for img, _ in eval_batches:
        d = run(jnp.asarray(img))
        valid = np.asarray(d.valid)
        for b in range(valid.shape[0]):
            keep = valid[b]
            out.append({
                "box": np.asarray(d.box)[b][keep],
                "label": np.asarray(d.label)[b][keep],
                "score": np.asarray(d.score)[b][keep],
                "mask": np.asarray(d.mask)[b][keep] > 0.5,
            })
    return out


# ------------------------------------------------------------ scoring


def _box_iou(a, b):
    ay0, ax0 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ay1, ax1 = a[0] + a[2] / 2, a[1] + a[3] / 2
    by0, bx0 = b[0] - b[2] / 2, b[1] - b[3] / 2
    by1, bx1 = b[0] + b[2] / 2, b[1] + b[3] / 2
    iy = max(0.0, min(ay1, by1) - max(ay0, by0))
    ix = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    inter = iy * ix
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def score(detections, eval_batches):
    """Box AP (PR sweep over 10 thresholds, the reference evaluator's
    method) + mean mask IoU over box-matched detections."""
    from tauv_vision_tpu.eval.detection_eval import (
        EvalDetection,
        average_precision,
        iou_match,
        precision_recall_curve,
    )

    det_lists, truth_lists = [], []
    mask_ious = []
    i = 0
    for img, fields in eval_batches:
        for b in range(img.shape[0]):
            d = detections[i]
            i += 1
            det_lists.append([
                EvalDetection(int(d["label"][k]), float(d["score"][k]),
                              float(d["box"][k][0]), float(d["box"][k][1]),
                              float(d["box"][k][2]), float(d["box"][k][3]))
                for k in range(len(d["label"]))
            ])
            tl = []
            order = np.argsort(-d["score"]) if len(d["score"]) else []
            used = set()
            for j in np.flatnonzero(fields["valid"][b]):
                tb = fields["box"][b, j]
                tl.append(EvalDetection(1, 1.0, float(tb[0]), float(tb[1]),
                                        float(tb[2]), float(tb[3])))
                # mask IoU for the best box-matched detection
                best, best_iou = None, 0.5
                for k in order:
                    if k in used:
                        continue
                    iou = _box_iou(d["box"][k], tb)
                    if iou >= best_iou:
                        best, best_iou = k, iou
                        break
                if best is not None:
                    used.add(best)
                    pm = d["mask"][best]
                    tm = fields["seg"][b] == j
                    inter = np.logical_and(pm, tm).sum()
                    union = np.logical_or(pm, tm).sum()
                    mask_ious.append(inter / union if union else 0.0)
            truth_lists.append(tl)

    out = {}
    for iou in (0.3, 0.5):
        _, precision, recall = precision_recall_curve(
            det_lists, truth_lists, iou_match(iou)
        )
        out[f"ap_iou{iou}"] = round(average_precision(precision, recall), 4)
        out[f"max_recall_iou{iou}"] = round(float(recall.max()), 4)
    out["mask_miou"] = round(float(np.mean(mask_ious)), 4) if mask_ious \
        else 0.0
    out["n_mask_matched"] = len(mask_ious)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--n-train-batches", type=int, default=50)
    parser.add_argument("--n-eval-batches", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--log-every", type=int, default=25)
    parser.add_argument("--cpu", action="store_true",
                        help="run the jax side on CPU (leave the TPU free)")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    if args.cpu:
        _force_cpu()

    train_batches, eval_batches = _make_data(
        args.n_train_batches, args.n_eval_batches, args.batch_size
    )

    print("=== training reference (torch) ===", flush=True)
    ref_model, ref_cfg = train_reference(
        train_batches, args.steps, args.lr, args.log_every
    )
    ref_dets = eval_reference(ref_model, ref_cfg, eval_batches)

    print("=== training rebuild (jax) ===", flush=True)
    our_model, our_cfg, our_state = train_ours(
        train_batches, args.steps, args.lr, args.log_every
    )
    our_dets = eval_ours(our_model, our_cfg, our_state, eval_batches)

    result = {"steps": args.steps, "batch_size": args.batch_size,
              "lr": args.lr,
              "n_eval_samples": len(eval_batches) * args.batch_size}
    for name, dets in (("reference", ref_dets), ("rebuild", our_dets)):
        for k, v in score(dets, eval_batches).items():
            result[f"{name}_{k}"] = v
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(result, fp, indent=2)
    return result


if __name__ == "__main__":
    main()
