"""Model construction / shape tests (reference inline self-tests:
centernet.py:145-176, dla.py:419-429, model.py:63-151, backbone.py:35-60)
plus torch numeric parity for layers with subtle semantics."""

from math import pi

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tauv_vision_tpu.configs import (
    AngleConfig,
    ObjectConfig,
    ObjectConfigSet,
    YolactModelConfig,
)
from tauv_vision_tpu.models.centernet import Centernet
from tauv_vision_tpu.models.dla import DLABackbone
from tauv_vision_tpu.models.layers import TorchConvTranspose
from tauv_vision_tpu.models.resnet import (
    Resnet18Features,
    load_torchvision_state_dict,
    resnet18_feature_shapes,
)
from tauv_vision_tpu.models.yolact import Yolact, n_total_anchors


def small_object_config():
    return ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="torpedo_22_circle",
                yaw=AngleConfig(train=True, modulo=2 * pi),
                pitch=AngleConfig(train=True, modulo=2 * pi),
                roll=AngleConfig(train=False, modulo=2 * pi),
                train_depth=True,
                train_keypoints=False,
                keypoints=None,
            ),
        )
    )


def test_dla_backbone_shapes():
    model = DLABackbone(heights=(1, 1), channels=(8, 8, 16), downsamples=2)
    img = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.key(0), img)
    out = model.apply(variables, img)
    assert out.shape == (1, 16, 24, 8)


def test_centernet_heads_and_prediction_shapes():
    oc = small_object_config()
    model = Centernet(
        object_config=oc,
        backbone_heights=(1, 1),
        backbone_channels=(8, 8, 16),
        downsamples=2,
    )
    img = jnp.zeros((2, 64, 96, 3))
    variables = model.init(jax.random.key(0), img)
    pred = model.apply(variables, img)

    assert pred.heatmap.shape == (2, 16, 24, 1)
    assert pred.size.shape == (2, 16, 24, 2)
    assert pred.offset.shape == (2, 16, 24, 2)
    assert pred.yaw_bin.shape == (2, 16, 24, 4)
    assert pred.pitch_offset.shape == (2, 16, 24, 4)
    assert pred.roll_bin is None
    assert pred.keypoint_heatmap is None
    assert pred.depth.shape == (2, 16, 24, 1)
    # Focal-init heatmap bias: mean sigmoid close to 0.1.
    p = jax.nn.sigmoid(pred.heatmap)
    assert 0.02 < float(p.mean()) < 0.3


def test_centernet_keypoint_heads():
    oc = ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="gate",
                yaw=AngleConfig(train=False, modulo=None),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=False,
                train_keypoints=True,
                keypoints=((0, 0, 0), (1, 0, 0), (0, 1, 0)),
            ),
        )
    )
    model = Centernet(
        object_config=oc, backbone_heights=(1,), backbone_channels=(8, 8),
        downsamples=2,
    )
    img = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), img)
    pred = model.apply(variables, img)
    assert pred.keypoint_heatmap.shape == (1, 8, 8, 3)
    assert pred.keypoint_affinity.shape == (1, 8, 8, 3, 2)
    assert pred.depth is None and pred.yaw_bin is None


def test_torch_conv_transpose_parity():
    """TorchConvTranspose == nn.ConvTranspose2d(k=3, s=2, p=1, op=1)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 6, 8)).astype(np.float32)  # NCHW for torch
    w = rng.normal(size=(4, 5, 3, 3)).astype(np.float32) * 0.2  # (in, out, kh, kw)
    b = rng.normal(size=(5,)).astype(np.float32)

    tconv = torch.nn.ConvTranspose2d(4, 5, 3, stride=2, padding=1, output_padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
    expected = tconv(torch.from_numpy(x)).detach().numpy()

    module = TorchConvTranspose(5, kernel_size=3, stride=2, padding=1, output_padding=1)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = module.init(jax.random.key(0), x_nhwc)
    # torch weight (in, out, kh, kw) -> HWIO
    kernel = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))
    variables = {"params": {"kernel": kernel, "bias": jnp.asarray(b)}}
    ours = np.asarray(module.apply(variables, x_nhwc))
    ours = np.transpose(ours, (0, 3, 1, 2))

    assert ours.shape == expected.shape == (1, 5, 12, 16)
    np.testing.assert_allclose(ours, expected, atol=1e-4)


class _TorchBasicBlock(torch.nn.Module):
    """torchvision BasicBlock restated (for parity without torchvision)."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.downsample = None
        if downsample:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(inplanes, planes, 1, stride, bias=False),
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


class _TorchResnet18Trunk(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        self.layer1 = torch.nn.ModuleList(
            [_TorchBasicBlock(64, 64), _TorchBasicBlock(64, 64)]
        )
        self.layer2 = torch.nn.ModuleList(
            [_TorchBasicBlock(64, 128, 2, True), _TorchBasicBlock(128, 128)]
        )
        self.layer3 = torch.nn.ModuleList(
            [_TorchBasicBlock(128, 256, 2, True), _TorchBasicBlock(256, 256)]
        )
        self.layer4 = torch.nn.ModuleList(
            [_TorchBasicBlock(256, 512, 2, True), _TorchBasicBlock(512, 512)]
        )

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        taps = []
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x, _ = layer[0](x)
            x, tap = layer[1](x)
            taps.append(tap)
        return taps[1:]  # layer2/3/4 taps

    def torchvision_state_dict(self):
        """Emit a torchvision-keyed state_dict for the converter."""
        sd = {}
        sd["conv1.weight"] = self.conv1.weight
        for stat in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{stat}"] = getattr(self.bn1, stat)
        for li, layer in enumerate(
            (self.layer1, self.layer2, self.layer3, self.layer4), start=1
        ):
            for bi, block in enumerate(layer):
                pre = f"layer{li}.{bi}"
                sd[f"{pre}.conv1.weight"] = block.conv1.weight
                sd[f"{pre}.conv2.weight"] = block.conv2.weight
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.bn1.{stat}"] = getattr(block.bn1, stat)
                    sd[f"{pre}.bn2.{stat}"] = getattr(block.bn2, stat)
                if block.downsample is not None:
                    sd[f"{pre}.downsample.0.weight"] = block.downsample[0].weight
                    for stat in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{pre}.downsample.1.{stat}"] = getattr(
                            block.downsample[1], stat
                        )
        return sd


@pytest.mark.slow
def test_resnet18_parity_with_torch():
    """Random torch trunk -> state_dict import -> identical tap features
    (eval mode / running stats)."""
    torch.manual_seed(0)
    trunk = _TorchResnet18Trunk().eval()
    # Randomize running stats so BN parity is actually exercised.
    with torch.no_grad():
        for m in trunk.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(1).normal(size=(1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        expected = [t.numpy() for t in trunk(torch.from_numpy(x))]

    variables = load_torchvision_state_dict(trunk.torchvision_state_dict())
    model = Resnet18Features()
    ours = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))

    assert len(ours) == 3
    for got, want in zip(ours, expected):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_resnet_feature_shapes_helper():
    shapes = resnet18_feature_shapes(360, 640)
    assert shapes == [(45, 80), (23, 40), (12, 20)]


def test_yolact_forward_shapes():
    cfg = YolactModelConfig(
        in_w=96, in_h=64, feature_depth=16, n_classes=2, n_prototype_masks=4,
        n_masknet_layers_pre_upsample=1, n_masknet_layers_post_upsample=1,
        n_prediction_head_layers=1, n_classification_layers=0, n_box_layers=0,
        n_mask_layers=0, n_fpn_downsample_layers=2,
        anchor_scales=(24, 48, 96, 192, 384), anchor_aspect_ratios=(1.0,),
        box_variances=(0.1, 0.2), iou_pos_threshold=0.5, iou_neg_threshold=0.4,
        negative_example_ratio=3,
    )
    model = Yolact(cfg)
    img = jnp.zeros((2, cfg.in_h, cfg.in_w, 3))
    variables = model.init(jax.random.key(0), img)
    pred = model.apply(variables, img, train=False)

    n = n_total_anchors(cfg)
    assert pred.classification.shape == (2, n, 3)
    assert pred.box_encoding.shape == (2, n, 4)
    assert pred.mask_coeff.shape == (2, n, 4)
    assert pred.anchor.shape == (n, 4)
    # Protonet upsamples FPN level 0 (stride 8) twice -> stride 2.
    assert pred.mask_prototype.shape == (2, 32, 48, 4)
    # Coefficients are tanh-bounded.
    assert float(jnp.abs(pred.mask_coeff).max()) <= 1.0
    # Anchor count per level sanity: sum of level cells.
    from tauv_vision_tpu.ops.anchors import fpn_level_sizes
    sizes = fpn_level_sizes(64, 96, 5)
    assert n == sum(h * w for h, w in sizes)
