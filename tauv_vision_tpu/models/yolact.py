"""YOLACT model assembly.

Parity target: ``yolact/model/model.py:18-60`` — ResNet backbone -> FPN
(3 taps + extra levels) -> protonet on level 0 + one *shared* prediction
head applied to every FPN level; per-level outputs concatenated over the
anchor axis.

TPU-first differences:
- Anchors are a compile-time constant (see ops/anchors.py) rather than
  regenerated per forward pass; the model returns them for API parity.
- NHWC throughout; outputs in f32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from tauv_vision_tpu.configs.yolact import YolactModelConfig
from tauv_vision_tpu.models.fpn import FeaturePyramid
from tauv_vision_tpu.models.prediction_head import PredictionHead
from tauv_vision_tpu.models.protonet import Protonet
from tauv_vision_tpu.models.resnet import Resnet18Features
from tauv_vision_tpu.ops.anchors import get_all_anchors


@flax.struct.dataclass
class YolactPrediction:
    classification: jnp.ndarray   # [B, N, C+1] logits
    box_encoding: jnp.ndarray     # [B, N, 4]
    mask_coeff: jnp.ndarray       # [B, N, P] (tanh'd)
    anchor: jnp.ndarray           # [N, 4] (y, x, h, w)
    mask_prototype: jnp.ndarray   # [B, proto_h, proto_w, P]

    def as_tuple(self) -> Tuple[jnp.ndarray, ...]:
        """Reference 5-tuple order (model.py:60), anchor broadcast to
        [1, N, 4] and prototypes channel-first [B, P, h, w]."""
        return (
            self.classification,
            self.box_encoding,
            self.mask_coeff,
            self.anchor[None],
            jnp.moveaxis(self.mask_prototype, -1, 1),
        )


class Yolact(nn.Module):
    config: YolactModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> YolactPrediction:
        cfg = self.config

        backbone_outputs = Resnet18Features(dtype=self.dtype, name="backbone")(
            img, train=train
        )

        fpn_outputs = FeaturePyramid(
            feature_depth=cfg.feature_depth,
            n_downsample_layers=cfg.n_fpn_downsample_layers,
            dtype=self.dtype,
            name="fpn",
        )(backbone_outputs)

        mask_prototype = Protonet(
            feature_depth=cfg.feature_depth,
            n_prototype_masks=cfg.n_prototype_masks,
            n_layers_pre_upsample=cfg.n_masknet_layers_pre_upsample,
            n_layers_post_upsample=cfg.n_masknet_layers_post_upsample,
            dtype=self.dtype,
            name="protonet",
        )(fpn_outputs[0])

        head = PredictionHead(
            feature_depth=cfg.feature_depth,
            n_classes=cfg.n_classes,
            n_prototype_masks=cfg.n_prototype_masks,
            n_anchors=cfg.n_anchors_per_cell,
            n_prediction_head_layers=cfg.n_prediction_head_layers,
            n_classification_layers=cfg.n_classification_layers,
            n_box_layers=cfg.n_box_layers,
            n_mask_layers=cfg.n_mask_layers,
            dtype=self.dtype,
            name="prediction_head",
        )

        classifications = []
        box_encodings = []
        mask_coeffs = []
        for fpn_output in fpn_outputs:
            classification, box_encoding, mask_coeff = head(fpn_output, train=train)
            classifications.append(classification)
            box_encodings.append(box_encoding)
            mask_coeffs.append(mask_coeff)

        anchor = jnp.asarray(
            get_all_anchors(
                cfg.in_h,
                cfg.in_w,
                cfg.n_fpn_levels,
                cfg.anchor_scales,
                cfg.anchor_aspect_ratios,
            )
        )

        return YolactPrediction(
            classification=jnp.concatenate(classifications, axis=1),
            box_encoding=jnp.concatenate(box_encodings, axis=1),
            mask_coeff=jnp.concatenate(mask_coeffs, axis=1),
            anchor=anchor,
            mask_prototype=mask_prototype,
        )


def n_total_anchors(config: YolactModelConfig) -> int:
    return get_all_anchors(
        config.in_h,
        config.in_w,
        config.n_fpn_levels,
        config.anchor_scales,
        config.anchor_aspect_ratios,
    ).shape[0]


def load_yolact_state_dict(state_dict) -> dict:
    """Convert a FULL reference torch ``Yolact`` state_dict —
    ResNet-18 backbone + FPN + masknet + shared prediction head
    (yolact/model/model.py:18-60) — into (params, batch_stats) pytrees
    for :class:`Yolact`.

    Extends the trunk-only ``resnet.load_torchvision_state_dict`` to
    the complete graph so ONE set of trained torch weights can run in
    both stacks and decoded outputs can be compared END-TO-END
    (the YOLACT leg of the shared-weights transplant,
    scripts/transplant_parity_yolact.py).

    Torch -> flax name mapping:
      _backbone.[_feature_extractor.]<torchvision resnet18 keys>
          -> backbone/... (delegated to load_torchvision_state_dict)
      _feature_pyramid._lateral_layers.{i}     -> fpn/lateral_{i}
      _feature_pyramid._prediction_layers.{i}  -> fpn/prediction_{i}
      _feature_pyramid._downsample_layers.{i}  -> fpn/downsample_{i}
      _masknet._layers_{1,2,3}.{i}.0 -> protonet/{pre,mid,post}_{i}
      _masknet._upsample_layer_{n}   -> protonet/upsample_{n}
          (ConvTranspose2d [Cin,Cout,kh,kw] -> [kh,kw,Cin,Cout])
      _masknet._output_layer         -> protonet/output
      _prediction_head._extra_layers.{i}.<m>      -> prediction_head/
          shared_{i}/bottleneck/<m>  (conv1..3 / bn1..3)
      _prediction_head._extra_conv_layers.{i}     -> shared_{i}/conv
      _prediction_head._extra_bn_layers.{i}       -> shared_{i}/bn
      _prediction_head._{classification,box,mask}_extra_*  -> cls_{i}/
          box_{i}/mask_{i} (same sub-mapping)
      _prediction_head._classification_layer -> prediction_head/
          classification; _box_encoding_layer -> box;
          _mask_coeff_layer -> mask
    Exactness: tests/test_yolact_import.py.
    """
    import numpy as _np

    from tauv_vision_tpu.models.resnet import load_torchvision_state_dict

    def arr(value):
        value = (
            value.detach().cpu().numpy() if hasattr(value, "detach")
            else _np.asarray(value)
        )
        return value.astype(_np.float32)

    trunk = {}
    rest = {}
    for key, value in state_dict.items():
        if key.startswith("_backbone."):
            sub = key[len("_backbone."):]
            if sub.startswith("_feature_extractor."):
                sub = sub[len("_feature_extractor."):]
            trunk[sub] = value
        else:
            rest[key] = value

    trunk_vars = load_torchvision_state_dict(trunk)
    params = {"backbone": trunk_vars["params"]}
    stats = {"backbone": trunk_vars["batch_stats"]}

    def ensure(tree, path):
        node = tree
        for k in path:
            node = node.setdefault(k, {})
        return node

    def put_conv(path, stat, value, transpose=(2, 3, 1, 0)):
        node = ensure(params, path[:-1]).setdefault(path[-1], {})
        if stat == "weight":
            node["kernel"] = jnp.asarray(
                _np.transpose(arr(value), transpose)
            )
        else:
            node["bias"] = jnp.asarray(arr(value))

    def put_bn(path, stat, value):
        name = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}.get(stat)
        if name is None:  # num_batches_tracked
            return
        tree = stats if name in ("mean", "var") else params
        ensure(tree, path[:-1]).setdefault(path[-1], {})[name] = (
            jnp.asarray(arr(value))
        )

    head_groups = {
        "_extra": "shared",
        "_classification_extra": "cls",
        "_box_extra": "box",
        "_mask_extra": "mask",
    }

    for key, value in rest.items():
        tokens = key.split(".")
        stat = tokens[-1]
        if tokens[0] == "_feature_pyramid":
            kind = {"_lateral_layers": "lateral",
                    "_prediction_layers": "prediction",
                    "_downsample_layers": "downsample"}[tokens[1]]
            put_conv(["fpn", f"{kind}_{tokens[2]}"], stat, value)
        elif tokens[0] == "_masknet":
            if tokens[1].startswith("_layers_"):
                prefix = {"1": "pre", "2": "mid", "3": "post"}[
                    tokens[1][len("_layers_"):]
                ]
                put_conv(["protonet", f"{prefix}_{tokens[2]}"], stat, value)
            elif tokens[1].startswith("_upsample_layer_"):
                n = tokens[1][len("_upsample_layer_"):]
                # ConvTranspose2d weight [Cin, Cout, kh, kw].
                put_conv(["protonet", f"upsample_{n}"], stat, value,
                         transpose=(2, 3, 0, 1))
            elif tokens[1] == "_output_layer":
                put_conv(["protonet", "output"], stat, value)
            else:
                raise ValueError(f"unrecognized key: {key}")
        elif tokens[0] == "_prediction_head":
            sub = tokens[1]
            if sub == "_classification_layer":
                put_conv(["prediction_head", "classification"], stat, value)
            elif sub == "_box_encoding_layer":
                put_conv(["prediction_head", "box"], stat, value)
            elif sub == "_mask_coeff_layer":
                put_conv(["prediction_head", "mask"], stat, value)
            else:
                for torch_group, flax_group in head_groups.items():
                    if sub == torch_group + "_layers":
                        # Bottleneck: conv1..3 / bn1..3.
                        stage = [
                            "prediction_head", f"{flax_group}_{tokens[2]}",
                            "bottleneck", tokens[3],
                        ]
                        if tokens[3].startswith("bn"):
                            put_bn(stage, stat, value)
                        else:
                            put_conv(stage, stat, value)
                        break
                    if sub == torch_group + "_conv_layers":
                        put_conv(
                            ["prediction_head", f"{flax_group}_{tokens[2]}",
                             "conv"], stat, value,
                        )
                        break
                    if sub == torch_group + "_bn_layers":
                        put_bn(
                            ["prediction_head", f"{flax_group}_{tokens[2]}",
                             "bn"], stat, value,
                        )
                        break
                else:
                    raise ValueError(f"unrecognized key: {key}")
        else:
            raise ValueError(f"unrecognized key: {key}")

    return {"params": params, "batch_stats": stats}


def export_yolact_state_dict(variables) -> dict:
    """Inverse of :func:`load_yolact_state_dict`: flax ``Yolact``
    (params, batch_stats) pytrees -> a torch-naming state_dict of numpy
    arrays (the offline reference harness's module names — torchvision
    resnet18 keys under ``_backbone.``).

    Lets weights TRAINED IN THE REBUILD run through the torch reference
    graph for the shared-weights transplant comparison
    (scripts/transplant_parity_yolact.py); exactness via the round-trip
    test (export(load(sd)) == sd, tests/test_yolact_import.py) plus the
    forward-parity the import test establishes.
    """
    import numpy as _np

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out = {}

    def np_of(leaf):
        return _np.asarray(leaf, dtype=_np.float32)

    def get(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    def conv(torch_key, path, transpose=(3, 2, 0, 1)):
        node = get(params, path)
        out[torch_key + ".weight"] = _np.transpose(
            np_of(node["kernel"]), transpose
        )
        if "bias" in node:
            out[torch_key + ".bias"] = np_of(node["bias"])

    def bn(torch_key, path):
        p = get(params, path)
        s = get(stats, path)
        out[torch_key + ".weight"] = np_of(p["scale"])
        out[torch_key + ".bias"] = np_of(p["bias"])
        out[torch_key + ".running_mean"] = np_of(s["mean"])
        out[torch_key + ".running_var"] = np_of(s["var"])
        out[torch_key + ".num_batches_tracked"] = _np.asarray(0, _np.int64)

    # Backbone (torchvision resnet18 naming; flax HWIO -> torch OIHW).
    conv("_backbone.conv1", ["backbone", "conv1"])
    bn("_backbone.bn1", ["backbone", "bn1"])
    for layer_i in (1, 2, 3, 4):
        for block_i in (0, 1):
            fb = ["backbone", f"layer{layer_i}_{block_i}"]
            tb = f"_backbone.layer{layer_i}.{block_i}"
            conv(tb + ".conv1", fb + ["conv1"])
            bn(tb + ".bn1", fb + ["bn1"])
            conv(tb + ".conv2", fb + ["conv2"])
            bn(tb + ".bn2", fb + ["bn2"])
            if layer_i >= 2 and block_i == 0:
                conv(tb + ".downsample.0", fb + ["downsample_conv"])
                bn(tb + ".downsample.1", fb + ["downsample_bn"])

    # FPN.
    fpn = params["fpn"]
    for name in fpn:
        kind, i = name.rsplit("_", 1)
        torch_kind = {"lateral": "_lateral_layers",
                      "prediction": "_prediction_layers",
                      "downsample": "_downsample_layers"}[kind]
        conv(f"_feature_pyramid.{torch_kind}.{i}", ["fpn", name])

    # Protonet.
    for name in params["protonet"]:
        if name.startswith("upsample_"):
            # flax [kh,kw,Cin,Cout] -> ConvTranspose2d [Cin,Cout,kh,kw].
            conv(
                f"_masknet._upsample_layer_{name[len('upsample_'):]}",
                ["protonet", name], transpose=(2, 3, 0, 1),
            )
        elif name == "output":
            conv("_masknet._output_layer", ["protonet", name])
        else:
            prefix, i = name.rsplit("_", 1)
            layers_n = {"pre": 1, "mid": 2, "post": 3}[prefix]
            conv(f"_masknet._layers_{layers_n}.{i}.0", ["protonet", name])

    # Prediction head.
    group_of = {"shared": "_extra", "cls": "_classification_extra",
                "box": "_box_extra", "mask": "_mask_extra"}
    for name in params["prediction_head"]:
        if name == "classification":
            conv("_prediction_head._classification_layer",
                 ["prediction_head", name])
        elif name == "box":
            conv("_prediction_head._box_encoding_layer",
                 ["prediction_head", name])
        elif name == "mask":
            conv("_prediction_head._mask_coeff_layer",
                 ["prediction_head", name])
        else:
            flax_group, i = name.rsplit("_", 1)
            tg = f"_prediction_head.{group_of[flax_group]}"
            base = ["prediction_head", name]
            for sub in ("conv1", "conv2", "conv3"):
                conv(f"{tg}_layers.{i}.{sub}", base + ["bottleneck", sub])
            for sub in ("bn1", "bn2", "bn3"):
                bn(f"{tg}_layers.{i}.{sub}", base + ["bottleneck", sub])
            conv(f"{tg}_conv_layers.{i}", base + ["conv"])
            bn(f"{tg}_bn_layers.{i}", base + ["bn"])

    return out
