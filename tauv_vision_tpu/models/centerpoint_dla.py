"""DLA-34 + deformable-conv IDA upsampling — the production CenterNet
backbone.

Parity target: ``centernet/model/backbones/centerpoint_dla.py`` (the
CenterPoint port the reference trains and deploys):
- DLA-34 trunk: base 7x7 conv, two conv levels, four HDA tree levels
  ([1,1,1,2,2,1] x [16,32,64,128,256,512], :224-315);
- DLAUp: iterative aggregation of the stride-4..32 levels with
  DeformConv project/node blocks and fixed-bilinear-initialized
  depthwise transposed convs (:411-462, :334-344);
- final IDAUp to a stride-4, 64-channel map; heads with a 256-wide 3x3
  conv and -2.19 heatmap bias (:476-531);
- deformable conv v2 with learned offset + sigmoid mask (:360-392),
  implemented here as the XLA gather formulation (ops/deform_conv.py).

The reference mutates its layer lists in place; this restates the same
dataflow functionally.  NHWC throughout.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.configs.centernet import ObjectConfigSet, get_head_channels
from tauv_vision_tpu.models.centernet import Prediction
from tauv_vision_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_shift

BN_MOMENTUM = 0.9  # == torch momentum 0.1
BN_EPS = 1e-5

DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)


def _bn(train: bool, name: str, out_dtype=jnp.float32):
    """BatchNorm matching torch numerics: the normalization itself ALWAYS
    computes in f32 (torch BN runs f32 — the 1e-3 parity bar needs it).

    ``out_dtype`` rounds the OUTPUT once (round-4 HBM lever): with f32
    outputs every BN->relu->residual-join map in the bf16 served graph
    materializes at twice the width its consumers read (the next conv
    immediately casts to bf16), ~30 MB/frame of pure traffic on the
    early trunk alone.  f32 (default) keeps the parity-suite-exact flow;
    bf16 is the served variant, decoded-delta certified by its own
    quantize_accuracy_check rung.
    """
    bn = nn.BatchNorm(
        use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
        dtype=jnp.float32, name=name,
    )
    if out_dtype == jnp.float32:
        return bn
    return lambda x: bn(x).astype(out_dtype)


def _pack_batch(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B/g,H,W,g*C]: image i of each g-group occupies
    channel block i."""
    b, h, w, c = x.shape
    return (
        x.reshape(b // g, g, h, w, c)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b // g, h, w, g * c)
    )


def _unpack_batch(x: jnp.ndarray, g: int) -> jnp.ndarray:
    b, h, w, gc = x.shape
    return (
        x.reshape(b, h, w, g, gc // g)
        .transpose(0, 3, 1, 2, 4)
        .reshape(b * g, h, w, gc // g)
    )


def _block_diag_kernel(k: jnp.ndarray, g: int) -> jnp.ndarray:
    """[kh,kw,ci,co] -> [kh,kw,g*ci,g*co] with k repeated on the block
    diagonal; cross-image blocks are structural zeros."""
    kh, kw, ci, co = k.shape
    eye = jnp.eye(g, dtype=k.dtype)
    kp = jnp.einsum("hwio,gk->hwgiko", k, eye)
    return kp.reshape(kh, kw, g * ci, g * co)


class _PackedConv(nn.Module):
    """3x3/7x7 conv over batch-group channel-packed activations.

    The parameter is the ORIGINAL [kh,kw,cin,cout] kernel (same name,
    shape, and init as the nn.Conv it replaces, so checkpoints and the
    DLA-34 importer are unaffected); at apply time it is expanded to
    block-diagonal [kh,kw,g*cin,g*cout] so one conv computes ``pack``
    images with full-width MXU tiles.  The 16/32-channel early levels
    otherwise waste the 128-lane MXU on both contraction and output
    padding (~8% utilization, scripts/early_conv_probe.py); the
    structural zero cross-image taps cost MACs those padded tiles were
    already paying for (scripts/early_pack_probe.py)."""

    features: int
    kernel: int
    pack: int
    stride: int = 1
    pad: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // self.pack
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.features), jnp.float32,
        )
        kp = _block_diag_kernel(k, self.pack).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp, (self.stride, self.stride),
            [(self.pad, self.pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class _PackedAffineBN(nn.Module):
    """Inference BatchNorm over channel-packed activations: the (C,)
    scale/bias/running stats (same names and shapes as nn.BatchNorm)
    are tiled ``pack`` times.  Mirrors flax's normalization formula and
    f32 dtype flow so the packed forward is numerically the unpacked
    one up to conv accumulation order."""

    pack: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // self.pack
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        y = x.astype(jnp.float32) - jnp.tile(mean.value, self.pack)
        y = y * jax.lax.rsqrt(jnp.tile(var.value, self.pack) + BN_EPS)
        return y * jnp.tile(scale, self.pack) + jnp.tile(bias, self.pack)


class _ConvParams(nn.Module):
    """Parameters of an nn.Conv (same names, shapes, inits) without the
    conv: lets DLASeg fuse the per-head convs into one dispatch while
    keeping the per-head parameter tree (checkpoints, importer)."""

    shape: Tuple[int, ...]  # [kh, kw, c_in, features]
    bias_init_value: float = 0.0

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape,
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.constant(self.bias_init_value),
            (self.shape[-1],), jnp.float32,
        )
        return kernel, bias


class BasicBlock(nn.Module):
    """conv3x3(s)-bn-relu-conv3x3-bn (+ supplied residual) - relu
    (centerpoint_dla.py:30-59); residual is padded to match."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_out: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = nn.relu(_bn(train, "bn1", self.bn_out)(out))
        out = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = _bn(train, "bn2", self.bn_out)(out)
        residual = pad_to_match(residual, out.shape[1:3])
        return nn.relu(out + residual.astype(out.dtype))


class Root(nn.Module):
    """concat -> 1x1 conv -> bn (+ children[0] if residual) -> relu
    (centerpoint_dla.py:147-165)."""

    out_channels: int
    residual: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_out: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, children: List[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        x = _bn(train, "bn", self.bn_out)(x)
        if self.residual:
            x = x + children[0].astype(x.dtype)
        return nn.relu(x)


class Tree(nn.Module):
    """HDA tree (centerpoint_dla.py:168-221)."""

    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_out: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        children = [] if children is None else list(children)

        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        bottom = x
        if self.stride > 1:
            # ceil-mode max pool.
            pad_h = (-x.shape[1]) % self.stride
            pad_w = (-x.shape[2]) % self.stride
            bottom = nn.max_pool(
                x, (self.stride, self.stride),
                strides=(self.stride, self.stride),
                padding=((0, pad_h), (0, pad_w)),
            )
        proj = bottom
        if self.in_channels != self.out_channels:
            proj = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                name="project_conv",
            )(bottom)
            proj = _bn(train, "project_bn", self.bn_out)(proj)

        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(
                self.out_channels, self.stride, dtype=self.dtype,
                bn_out=self.bn_out, name="tree1",
            )(x, residual=proj, train=train)
            x2 = BasicBlock(
                self.out_channels, 1, dtype=self.dtype,
                bn_out=self.bn_out, name="tree2",
            )(x1, train=train)
            return Root(
                self.out_channels, self.root_residual, dtype=self.dtype,
                bn_out=self.bn_out, name="root",
            )([x2, x1] + children, train=train)

        x1 = Tree(
            self.levels - 1, self.in_channels, self.out_channels,
            stride=self.stride, root_dim=0,
            root_residual=self.root_residual, dtype=self.dtype,
            bn_out=self.bn_out, name="tree1",
        )(x, residual=proj, train=train)
        children.append(x1)
        return Tree(
            self.levels - 1, self.out_channels, self.out_channels,
            root_dim=root_dim + self.out_channels,
            root_residual=self.root_residual, dtype=self.dtype,
            bn_out=self.bn_out, name="tree2",
        )(x1, children=children, train=train)


class DLATrunk(nn.Module):
    """DLA-34 feature trunk returning all six level outputs
    (centerpoint_dla.py:224-296).

    ``stem_s2d > 1`` runs the 7x7 RGB stem in space-to-depth phase form
    (exact rewrite, same parameter; ops/space_to_depth.py) — the C_in=3
    conv is otherwise the single most MXU-starved layer of the serving
    graph (measured 10% of the int8 batch)."""

    levels: Sequence[int] = DLA34_LEVELS
    channels: Sequence[int] = DLA34_CHANNELS
    stem_s2d: int = 0
    early_pack: int = 0
    dtype: jnp.dtype = jnp.float32
    bn_out: jnp.dtype = jnp.float32
    # Stages forced to full f32 (conv compute + BN outputs) regardless
    # of dtype/bn_out: subset of {"stem", "level0", "level1",
    # "level2".."level5"}; "early" = stem+level0+level1.  The
    # f32-from-level-K serving ladder's knob (scripts/cn_f32_ladder.py)
    # — parameter tree unchanged, so trained checkpoints load as-is.
    f32_stages: Tuple[str, ...] = ()

    def _hit(self, stage):
        return stage in self.f32_stages or (
            "early" in self.f32_stages
            and stage in ("stem", "level0", "level1")
        )

    def _sdt(self, stage):
        return jnp.float32 if self._hit(stage) else self.dtype

    def _sbn(self, stage):
        return jnp.float32 if self._hit(stage) else self.bn_out

    @nn.compact
    def __call__(self, img, train: bool = False) -> List[jnp.ndarray]:
        pack = self.early_pack
        if (
            pack > 1 and not train and self.stem_s2d <= 1
            and img.shape[0] % pack == 0
        ):
            # Batch-group channel packing for the MXU-starved early
            # levels (stem + level0 + level1; their outputs feed
            # nothing downstream of level2, so the single unpack at the
            # stride-2 level1 output is the only real transpose).
            # Parameters are shared with the unpacked path (same
            # names/shapes); see _PackedConv/_PackedAffineBN.
            x = _pack_batch(img, pack)
            x = _PackedConv(
                self.channels[0], 7, pack, pad=3, dtype=self.dtype,
                name="base_conv",
            )(x)
            x = nn.relu(_PackedAffineBN(pack, name="base_bn")(x))
            outputs = []
            for level_i in (0, 1):
                stride = 1 if level_i == 0 else 2
                for conv_i in range(self.levels[level_i]):
                    x = _PackedConv(
                        self.channels[level_i], 3, pack,
                        stride=stride if conv_i == 0 else 1, pad=1,
                        dtype=self.dtype,
                        name=f"level{level_i}_conv{conv_i}",
                    )(x)
                    x = nn.relu(_PackedAffineBN(
                        pack, name=f"level{level_i}_bn{conv_i}"
                    )(x))
                # Unpacked view; XLA dead-code-eliminates the level0
                # transpose (nothing consumes levels[:2] downstream).
                outputs.append(_unpack_batch(x, pack))
            x = outputs[-1]
        else:
            if self.stem_s2d > 1:
                from tauv_vision_tpu.models.layers import S2DStemConv

                x = S2DStemConv(
                    self.channels[0], 7, stride=1, f=self.stem_s2d,
                    dtype=self._sdt("stem"), name="base_conv",
                )(img)
            else:
                x = nn.Conv(
                    self.channels[0], (7, 7), padding=3, use_bias=False,
                    dtype=self._sdt("stem"), name="base_conv",
                )(img)
            x = nn.relu(_bn(train, "base_bn", self._sbn("stem"))(x))

            outputs = []

            # level0 / level1: plain conv levels.
            for level_i in (0, 1):
                stride = 1 if level_i == 0 else 2
                for conv_i in range(self.levels[level_i]):
                    x = nn.Conv(
                        self.channels[level_i], (3, 3),
                        strides=(stride if conv_i == 0 else 1,) * 2,
                        padding=1, use_bias=False,
                        dtype=self._sdt(f"level{level_i}"),
                        name=f"level{level_i}_conv{conv_i}",
                    )(x)
                    x = nn.relu(
                        _bn(train, f"level{level_i}_bn{conv_i}",
                            self._sbn(f"level{level_i}"))(x)
                    )
                outputs.append(x)

        # level2..5: trees.
        for level_i in (2, 3, 4, 5):
            x = Tree(
                self.levels[level_i],
                self.channels[level_i - 1],
                self.channels[level_i],
                stride=2,
                level_root=(level_i != 2),
                dtype=self._sdt(f"level{level_i}"),
                bn_out=self._sbn(f"level{level_i}"),
                name=f"level{level_i}",
            )(x, train=train)
            outputs.append(x)

        return outputs


class DeformConvBlock(nn.Module):
    """DCNv2 + BN + relu (centerpoint_dla.py:360-392): 3x3 offset conv,
    3x3 mask conv (sigmoid), modulated deform conv.

    ``deform=False`` swaps the DCN for a plain 3x3 conv — the custom
    backbone's IDA style (dla.py:212-284) and the fastest inference
    option (SURVEY.md §7 names the non-deform fallback).

    ``dcn_impl`` selects the deformable implementation: "pallas"
    (ops/pallas/deform_conv.py — VMEM strip streaming, the fast serving
    path), "shift" (XLA static-shift-window formulation, exact for
    |offset| <= max_offset like pallas but materializes shifted maps),
    or "gather" (unbounded offsets, torchvision-exact, slow on TPU).
    """

    out_channels: int
    deform: bool = True
    dcn_impl: str = "shift"
    dcn_max_offset: float = 3
    offset_bound: Optional[float] = None
    # Serve the offset + mask convs as ONE 27-output-channel conv
    # (trace-time kernel/bias concat, split after): both 3x3 convs read
    # the same input and the MXU pads 18- and 9-lane outputs to 128
    # each, so merging halves that stage's cost BIT-IDENTICALLY (each
    # output channel contracts the same taps either way).  Init still
    # builds the two nn.Conv params, so checkpoints, importers, and the
    # reference param layout (centerpoint_dla.py:377-385) are untouched.
    merge_offset_mask: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_out: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.deform:
            out = nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                name="conv",
            )(x)
            return nn.relu(_bn(train, "bn", self.bn_out)(out))
        if self.merge_offset_mask and not self.is_initializing():
            po = self.get_variable("params", "offset")
            pm = self.get_variable("params", "mask")
            kom = jnp.concatenate(
                [po["kernel"], pm["kernel"]], axis=-1
            ).astype(self.dtype)
            bom = jnp.concatenate(
                [po["bias"], pm["bias"]], axis=-1
            ).astype(self.dtype)
            om = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kom, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bom
            offset, mask = om[..., :18], om[..., 18:]
        else:
            offset = nn.Conv(
                18, (3, 3), padding=1, dtype=self.dtype, name="offset",
                kernel_init=nn.initializers.zeros,
            )(x)
            mask = nn.Conv(
                9, (3, 3), padding=1, dtype=self.dtype, name="mask",
                kernel_init=nn.initializers.zeros,
            )(x)
        if self.offset_bound is not None:
            # Bounded-offset DCNv2: squash the raw offsets through
            # bound*tanh(raw/bound) so |offset| < bound holds BY
            # CONSTRUCTION (identity slope at 0, so training dynamics
            # near the zero init match the unbounded reference).  With
            # dcn_max_offset >= offset_bound the shift-window kernels
            # are then exact, full stop — no train-time regularization
            # or serving-time clamping asterisk.  The TPU-first revision
            # of the reference's unbounded torchvision DCN
            # (centerpoint_dla.py:360-392); accuracy evidence:
            # scripts/compare_reference_accuracy.py --deform.
            bound = jnp.asarray(self.offset_bound, offset.dtype)
            offset = bound * jnp.tanh(offset / bound)
        mask = jax.nn.sigmoid(mask)
        # Expose the learned offsets so training can regularize their
        # range (loss_lambda_dcn_offset): offsets held inside the
        # serving radius make the R-bounded Pallas/shift kernels EXACT
        # in practice instead of clamping (BENCH.md "Known limits").
        self.sow("intermediates", "dcn_offset", offset)

        weight = self.param(
            "weight",
            nn.initializers.he_normal(),
            (3, 3, x.shape[-1], self.out_channels),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,), jnp.float32
        )
        if self.dcn_impl == "pallas":
            from tauv_vision_tpu.ops.pallas.deform_conv import (
                deform_conv2d_pallas,
            )

            out = deform_conv2d_pallas(
                x.astype(self.dtype),
                offset.astype(jnp.float32),
                mask.astype(jnp.float32),
                weight.astype(self.dtype),
                bias,
                padding=1,
                max_offset=self.dcn_max_offset,
                # Sign-selected lerp: exact for radii <= 1 and ~6x
                # faster than the hat window on chip (BENCH.md).
                variant="lerp" if self.dcn_max_offset <= 1 else "full",
            )
        elif self.dcn_impl == "shift":
            out = deform_conv2d_shift(
                x.astype(self.dtype),
                offset.astype(jnp.float32),
                mask.astype(jnp.float32),
                weight.astype(self.dtype),
                bias,
                padding=1,
                max_offset=self.dcn_max_offset,
            )
        else:
            out = deform_conv2d(
                x.astype(self.dtype),
                offset.astype(jnp.float32),
                mask.astype(jnp.float32),
                weight.astype(self.dtype),
                bias,
                stride=1, padding=1,
            )
        return nn.relu(_bn(train, "bn", self.bn_out)(out))


def _bilinear_kernel(k: int) -> np.ndarray:
    """fill_up_weights bilinear upsample kernel (centerpoint_dla.py:334-344)."""
    f = int(np.ceil(k / 2))
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((k, k), np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    return w


class DepthwiseUpsample(nn.Module):
    """groups=C ConvTranspose(kernel=2f, stride=f, padding=f//2,
    bias=False) initialized to bilinear interpolation, exactly matching
    torch's parameterization (trainable, like the reference)."""

    factor: int
    impl: str = "dilated"  # "dilated" | "block"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        k = 2 * f
        c = x.shape[-1]

        def init(key, shape, dtype):
            kernel = _bilinear_kernel(k)
            return jnp.asarray(
                np.broadcast_to(kernel[:, :, None, None], shape), dtype
            )

        kernel = self.param("kernel", init, (k, k, 1, c), jnp.float32)

        if self.impl == "block":
            # Zero-free block-phase sum (ops/conv_transpose.
            # depthwise_upsample_block): the depth-to-space is a pure
            # adjacent-axis reshape, avoiding the layout flip that made
            # the channel-major phase form lose whole-model.  Verdict
            # on chip: scripts/upsample_ab_probe.py.
            from tauv_vision_tpu.ops.conv_transpose import (
                depthwise_upsample_block,
            )

            return depthwise_upsample_block(
                x.astype(self.dtype), kernel.astype(self.dtype), f
            )

        if self.impl == "pallas":
            # Zero-free phase math INSIDE one Pallas program with a
            # standard NHWC write (ops/pallas/depthwise_upsample.py) —
            # XLA sees conv-in/conv-out with no layout freedom, built
            # to test whether the dilated form's surrounding-graph
            # layout interactions cost the aggregation stage anything
            # in context (standalone the dilated form already measures
            # AT the VPU floor, scripts/ida_upsample_probe.py).
            from tauv_vision_tpu.ops.pallas.depthwise_upsample import (
                depthwise_upsample_pallas,
            )

            return depthwise_upsample_pallas(
                x.astype(self.dtype), kernel, f
            )

        # Dilated depthwise correlation.  Lowering alternatives are
        # measured dead ends at every factor: the zero-free phase form
        # wins standalone for f=4 (37x, scripts/upsample_probe.py) but
        # LOSES 15% of whole-model fps in context (CN 2325 -> 1986 at
        # batch 128) — its depth-to-space forces a layout change on the
        # surrounding graph — and loses standalone for f=2 (depth-to-
        # space pass > 4x dilation zeros; the round-2 all-phase sweep's
        # regression, CN 2748 -> 2141).
        pad = k - 1 - f // 2
        flipped = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            flipped,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )


def pad_to_match(feature: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """The PRODUCTION graph's size-matcher, reference-exact
    (centerpoint_dla.py:395-409): when the feature OVERSHOOTS the
    target by >= 2 (the final ida_up's x4 branch at serving resolution:
    23x40 -> 92x164 vs 90x160), the reference pads (over//2) zero
    rows/cols at the TOP/LEFT and then crops to the first target rows —
    shifting content down/right and dropping the tail.  The torch net
    TRAINS with that shift, so weight-transplant parity requires
    reproducing it verbatim; the even-size and overshoot-by-1 cases
    reduce to a plain tail crop, where the sane crop
    (models/dla.pad_to_match) agrees.  Round-5 transplant bisect: this
    one branch carried the entire full-graph drift (heatmap p99 0.21 ->
    f32-exact after the fix)."""
    h, w = feature.shape[1], feature.shape[2]
    th, tw = target_hw
    if (h, w) == (th, tw):
        return feature
    pad_top = max(0, (h - th) // 2)
    pad_bottom = max(0, th - h - pad_top)
    pad_left = max(0, (w - tw) // 2)
    pad_right = max(0, tw - w - pad_left)
    feature = jnp.pad(
        feature,
        ((0, 0), (pad_top, pad_bottom), (pad_left, pad_right), (0, 0)),
    )
    return feature[:, :th, :tw, :]


class IDAUpStage(nn.Module):
    """One IDAUp (centerpoint_dla.py:411-438) applied functionally:
    for i in 1..n-1: layers[i] = node(up(proj(layers[i])) + layers[i-1])."""

    out_channels: int
    up_factors: Sequence[int]  # per input index >= 1
    deform: bool = True
    dcn_impl: str = "shift"
    dcn_max_offset: float = 3
    offset_bound: Optional[float] = None
    up_impl: str = "dilated"
    dtype: jnp.dtype = jnp.float32
    bn_out: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        layers = list(layers)
        for i in range(1, len(layers)):
            projected = DeformConvBlock(
                self.out_channels, deform=self.deform,
                dcn_impl=self.dcn_impl,
                dcn_max_offset=self.dcn_max_offset,
                offset_bound=self.offset_bound, dtype=self.dtype,
                bn_out=self.bn_out, name=f"proj_{i}",
            )(layers[i], train=train)
            upsampled = DepthwiseUpsample(
                int(self.up_factors[i]), impl=self.up_impl,
                dtype=self.dtype, name=f"up_{i}"
            )(projected) if self.up_factors[i] > 1 else projected
            upsampled = pad_to_match(upsampled, layers[i - 1].shape[1:3])
            layers[i] = DeformConvBlock(
                self.out_channels, deform=self.deform,
                dcn_impl=self.dcn_impl,
                dcn_max_offset=self.dcn_max_offset,
                offset_bound=self.offset_bound, dtype=self.dtype,
                bn_out=self.bn_out, name=f"node_{i}",
            )(upsampled + layers[i - 1], train=train)
        return layers


class DLAUp(nn.Module):
    """Aggregate levels first_level..5 down to stride-4
    (centerpoint_dla.py:441-462)."""

    channels: Sequence[int]  # channels of the consumed levels
    deform: bool = True
    dcn_impl: str = "shift"
    dcn_max_offset: float = 3
    offset_bound: Optional[float] = None
    up_impl: str = "dilated"
    dtype: jnp.dtype = jnp.float32
    bn_out: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        n = len(layers)
        channels = list(self.channels)
        in_channels = list(self.channels)
        scales = np.array([2**i for i in range(n)], dtype=int)

        out = [layers[-1]]
        layers = list(layers)
        for i in range(n - 1):
            j = -i - 2
            stage = IDAUpStage(
                channels[j],
                (scales[j:] // scales[j]).tolist(),
                deform=self.deform,
                dcn_impl=self.dcn_impl,
                dcn_max_offset=self.dcn_max_offset,
                offset_bound=self.offset_bound,
                up_impl=self.up_impl,
                dtype=self.dtype,
                bn_out=self.bn_out,
                name=f"ida_{i}",
            )
            updated = stage(layers[j:], train=train)
            layers[j:] = updated
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [channels[j]] * len(in_channels[j + 1:])
            out.insert(0, layers[-1])
        return out


class DLASeg(nn.Module):
    """Full backbone + heads (centerpoint_dla.py:476-531)."""

    head_channels: Sequence[int]
    down_ratio: int = 4
    last_level: int = 5
    head_conv: int = 256
    heatmap_head_indices: Tuple[int, ...] = (0,)
    deform: bool = True
    dcn_impl: str = "shift"
    dcn_max_offset: float = 3
    offset_bound: Optional[float] = None
    stem_s2d: int = 0
    early_pack: int = 0
    fuse_heads: bool = False
    up_impl: str = "dilated"
    dtype: jnp.dtype = jnp.float32
    bn_out: jnp.dtype = jnp.float32
    # Stages forced to full f32 regardless of dtype/bn_out: subset of
    # {"early", "level2".."level5", "dla_up", "ida_up", "heads"}.  The
    # f32-from-level-K serving ladder walks cumulative suffixes of the
    # chain (scripts/cn_f32_ladder.py); param tree unchanged.
    f32_stages: Tuple[str, ...] = ()

    def _sdt(self, stage):
        return jnp.float32 if stage in self.f32_stages else self.dtype

    def _sbn(self, stage):
        return jnp.float32 if stage in self.f32_stages else self.bn_out

    @nn.compact
    def __call__(self, img, train: bool = False) -> List[jnp.ndarray]:
        first_level = int(np.log2(self.down_ratio))

        levels = DLATrunk(
            stem_s2d=self.stem_s2d, early_pack=self.early_pack,
            dtype=self.dtype, bn_out=self.bn_out,
            f32_stages=self.f32_stages, name="base"
        )(img, train=train)

        channels = list(DLA34_CHANNELS[first_level:])
        dla_up_out = DLAUp(
            channels, deform=self.deform, dcn_impl=self.dcn_impl,
            dcn_max_offset=self.dcn_max_offset,
                offset_bound=self.offset_bound,
            up_impl=self.up_impl,
            dtype=self._sdt("dla_up"), bn_out=self._sbn("dla_up"),
            name="dla_up",
        )(levels[first_level:], train=train)

        y = list(dla_up_out[: self.last_level - first_level])
        up_factors = [2**i for i in range(self.last_level - first_level)]
        y = IDAUpStage(
            channels[0], up_factors, deform=self.deform,
            dcn_impl=self.dcn_impl, dcn_max_offset=self.dcn_max_offset,
                offset_bound=self.offset_bound,
            up_impl=self.up_impl,
            dtype=self._sdt("ida_up"), bn_out=self._sbn("ida_up"),
            name="ida_up",
        )(y, train=train)
        features = y[-1]

        if not self.fuse_heads:
            outputs = []
            for head_i, n_out in enumerate(self.head_channels):
                bias_init = (
                    -2.19 if head_i in self.heatmap_head_indices else 0.0
                )
                h = nn.Conv(
                    self.head_conv, (3, 3), padding=1,
                    dtype=self._sdt("heads"),
                    name=f"head_{head_i}_conv",
                )(features)
                h = nn.relu(h)
                h = nn.Conv(
                    n_out, (1, 1),
                    bias_init=nn.initializers.constant(bias_init),
                    dtype=self._sdt("heads"), name=f"head_{head_i}_out",
                )(h)
                outputs.append(h.astype(jnp.float32))
            return outputs

        # Fused heads (opt-in, measured SLOWER): one conv with the
        # kernels concatenated along the output dim computes every
        # head's 3x3 in a single pass, bit-identical per output channel
        # (parameter names/shapes/inits exactly match the per-head
        # nn.Conv ones).  An interleaved A/B on chip
        # (scripts/heads_ab_probe.py, batch 128, 4 rounds) measured it
        # 0.95x — XLA already streams the shared input well and the
        # [B,90,160,n*256] intermediate has a worse layout — so the
        # per-head path stays the default; a single-shot +12.7% that
        # motivated this was chip drift (+-9% session variance).
        conv_ks, conv_bs, out_ks, out_bs = [], [], [], []
        c_in = features.shape[-1]
        for head_i, n_out in enumerate(self.head_channels):
            bias_init = -2.19 if head_i in self.heatmap_head_indices else 0.0
            k, b = _ConvParams(
                (3, 3, c_in, self.head_conv), name=f"head_{head_i}_conv"
            )()
            conv_ks.append(k)
            conv_bs.append(b)
            k, b = _ConvParams(
                (1, 1, self.head_conv, n_out), bias_init_value=bias_init,
                name=f"head_{head_i}_out",
            )()
            out_ks.append(k)
            out_bs.append(b)

        h = jax.lax.conv_general_dilated(
            features.astype(self.dtype),
            jnp.concatenate(conv_ks, axis=-1).astype(self.dtype),
            (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.concatenate(conv_bs).astype(self.dtype)
        h = nn.relu(h)

        outputs = []
        for head_i, n_out in enumerate(self.head_channels):
            hi = h[..., head_i * self.head_conv : (head_i + 1)
                   * self.head_conv]
            o = jax.lax.conv_general_dilated(
                hi, out_ks[head_i].astype(self.dtype), (1, 1),
                [(0, 0)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + out_bs[head_i].astype(self.dtype)
            outputs.append(o.astype(jnp.float32))
        return outputs


class CenterpointDLA34(nn.Module):
    """Head-order wrapper emitting a Prediction
    (centerpoint_dla.py:544-578); NHWC fields."""

    object_config: ObjectConfigSet
    dtype: jnp.dtype = jnp.float32
    head_conv: int = 256
    deform: bool = True
    dcn_impl: str = "shift"
    dcn_max_offset: float = 3
    offset_bound: Optional[float] = None
    stem_s2d: int = 0
    early_pack: int = 0
    fuse_heads: bool = False
    up_impl: str = "dilated"
    # bf16 BN outputs (round-4 HBM lever; see _bn): f32 default is the
    # parity-suite-exact flow, bf16 the served variant certified by the
    # quantize_accuracy_check 'flax-bf16-bn16' rung.
    bn_out: jnp.dtype = jnp.float32
    # f32-from-level-K ladder stages (see DLASeg.f32_stages).
    f32_stages: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, img, train: bool = False) -> Prediction:
        oc = self.object_config
        head_channels = get_head_channels(oc)

        heatmap_heads = [0]
        if oc.train_keypoints:
            heatmap_heads.append(1)

        out = list(
            DLASeg(
                head_channels=head_channels,
                head_conv=self.head_conv,
                heatmap_head_indices=tuple(heatmap_heads),
                deform=self.deform,
                dcn_impl=self.dcn_impl,
                dcn_max_offset=self.dcn_max_offset,
                offset_bound=self.offset_bound,
                stem_s2d=self.stem_s2d,
                early_pack=self.early_pack,
                fuse_heads=self.fuse_heads,
                up_impl=self.up_impl,
                dtype=self.dtype,
                bn_out=self.bn_out,
                f32_stages=self.f32_stages,
                name="model",
            )(img, train=train)
        )

        heatmap = out.pop(0)
        keypoint_heatmap = None
        keypoint_affinity = None
        if oc.train_keypoints:
            keypoint_heatmap = out.pop(0)
            aff = out.pop(0)
            b, h, w, _ = aff.shape
            keypoint_affinity = aff.reshape(b, h, w, oc.n_keypoints, 2)

        size = out.pop(0)
        offset = out.pop(0)
        yaw_bin = out.pop(0) if oc.train_yaw else None
        yaw_offset = out.pop(0) if oc.train_yaw else None
        pitch_bin = out.pop(0) if oc.train_pitch else None
        pitch_offset = out.pop(0) if oc.train_pitch else None
        roll_bin = out.pop(0) if oc.train_roll else None
        roll_offset = out.pop(0) if oc.train_roll else None
        depth = out.pop(0) if oc.train_depth else None

        return Prediction(
            heatmap=heatmap,
            keypoint_heatmap=keypoint_heatmap,
            keypoint_affinity=keypoint_affinity,
            size=size,
            offset=offset,
            roll_bin=roll_bin,
            roll_offset=roll_offset,
            pitch_bin=pitch_bin,
            pitch_offset=pitch_offset,
            yaw_bin=yaw_bin,
            yaw_offset=yaw_offset,
            depth=depth,
        )


def load_dla34_state_dict(state_dict) -> dict:
    """Convert a torch DLA-34 trunk checkpoint (the reference's
    model-zoo ``dla34`` naming, centerpoint_dla.py:224-315) into
    (params, batch_stats) pytrees for :class:`DLATrunk`.

    Torch -> flax name mapping:
      base_layer.0/.1          -> base_conv / base_bn
      level{0,1}.{2i}/{2i+1}   -> level{0,1}_conv{i} / _bn{i}
      level{2..5}.<tree path>  -> level{2..5}/<tree path> with
        root.conv/root.bn      -> root/conv, root/bn
        project.0/.1           -> project_conv / project_bn
        conv1/bn1/conv2/bn2    -> unchanged (BasicBlock)
    The classifier head (``fc``) is dropped.
    """
    import numpy as _np

    def arr(value):
        value = (
            value.detach().cpu().numpy() if hasattr(value, "detach")
            else _np.asarray(value)
        )
        return value.astype(_np.float32)

    params: dict = {}
    stats: dict = {}

    def ensure(tree, path):
        node = tree
        for key in path:
            node = node.setdefault(key, {})
        return node

    bn_parts: dict = {}

    def put_bn_part(path, stat, value):
        bn_parts.setdefault(tuple(path), {})[stat] = arr(value)

    for key, value in state_dict.items():
        tokens = key.split(".")
        if tokens[0] == "fc":
            continue

        if tokens[0] == "base_layer":
            dst = ["base_conv"] if tokens[1] == "0" else ["base_bn"]
            rest = tokens[2:]
        elif tokens[0] in ("level0", "level1"):
            idx = int(tokens[1])
            kind = "conv" if idx % 2 == 0 else "bn"
            dst = [f"{tokens[0]}_{kind}{idx // 2}"]
            rest = tokens[2:]
        else:
            dst = [tokens[0]]
            rest = tokens[1:]
            out = []
            i = 0
            while i < len(rest) - 1:
                tok = rest[i]
                if tok == "root":
                    out.extend(["root", rest[i + 1]])
                    i += 2
                elif tok == "project":
                    out.append(
                        "project_conv" if rest[i + 1] == "0" else "project_bn"
                    )
                    i += 2
                else:
                    out.append(tok)
                    i += 1
            dst = dst + out
            rest = rest[i:]

        stat = rest[-1]
        if stat == "weight" and (
            "bn" in dst[-1] or dst[-1] in ("bn", "bn1", "bn2")
        ):
            put_bn_part(dst, "scale", value)
        elif stat == "weight":
            node = ensure(params, dst[:-1])
            node[dst[-1]] = {
                "kernel": jnp.asarray(_np.transpose(arr(value), (2, 3, 1, 0)))
            }
        elif stat == "bias":
            put_bn_part(dst, "bias", value)
        elif stat == "running_mean":
            put_bn_part(dst, "mean", value)
        elif stat == "running_var":
            put_bn_part(dst, "var", value)
        # num_batches_tracked: dropped.

    for path, parts in bn_parts.items():
        ensure(params, list(path)[:-1])[path[-1]] = {
            "scale": jnp.asarray(parts["scale"]),
            "bias": jnp.asarray(parts["bias"]),
        }
        ensure(stats, list(path)[:-1])[path[-1]] = {
            "mean": jnp.asarray(parts["mean"]),
            "var": jnp.asarray(parts["var"]),
        }

    return {"params": params, "batch_stats": stats}


def load_centerpoint_dla34_state_dict(state_dict) -> dict:
    """Convert a FULL reference ``CenterpointDLA34`` checkpoint — trunk
    + DLAUp + IDAUp (+DCN offset/mask convs) + depthwise bilinear
    up-convs + heads (centerpoint_dla.py:334-344,360-392,411-531,
    544-578) — into (params, batch_stats) pytrees for
    :class:`CenterpointDLA34`.

    Extends :func:`load_dla34_state_dict` (trunk only) to the complete
    served graph so ONE set of trained torch weights can run in both
    stacks and the decoded outputs can be compared END-TO-END
    (VERDICT r4 item 1).  Accepts both the torch wrapper's ``model.``
    prefix and a bare ``DLASeg`` state_dict.

    Torch -> flax name mapping beyond the trunk:
      dla_up.ida_{i}.proj_{j}.offset.{weight,bias} -> dla_up/ida_{i}/
        proj_{j}/offset/{kernel,bias}        (OIHW -> HWIO)
      ...mask.{weight,bias}                  -> .../mask/{kernel,bias}
      ...conv.{weight,bias} (DeformConv2d)   -> .../{weight,bias}
      ...conv.{weight,bias} (plain Conv2d — the plain-IDA harness
        variant, no sibling ``offset.`` keys) -> .../conv/{kernel,bias}
      ...actf.0.*  (BatchNorm)               -> .../bn/...
      dla_up.ida_{i}.up_{j}.weight [C,1,k,k] -> .../up_{j}/kernel
                                                 [k,k,1,C]
      ida_up.{proj,up,node}_{i}...           -> ida_up/... (same rules)
      {head_idx}.0.{weight,bias}             -> head_{head_idx}_conv
      {head_idx}.2.{weight,bias}             -> head_{head_idx}_out

    The resulting tree loads into ``CenterpointDLA34(object_config,
    deform=True, dcn_impl="gather", offset_bound=None)`` — the
    torchvision-exact DCN configuration — or ``deform=False`` for
    plain-IDA checkpoints.  Exactness: tests/test_dla34_import.py::
    test_centerpoint_dla34_full_import_parity.
    """
    import numpy as _np

    def arr(value):
        value = (
            value.detach().cpu().numpy() if hasattr(value, "detach")
            else _np.asarray(value)
        )
        return value.astype(_np.float32)

    # Strip the CenterpointDLA34 wrapper prefix if present.
    items = {
        (k[len("model."):] if k.startswith("model.") else k): v
        for k, v in state_dict.items()
    }

    trunk = {
        k[len("base."):]: v for k, v in items.items()
        if k.startswith("base.")
    }
    variables = load_dla34_state_dict(trunk)
    params = {"base": variables["params"]}
    stats = {"base": variables["batch_stats"]}

    def ensure(tree, path):
        node = tree
        for key in path:
            node = node.setdefault(key, {})
        return node

    def put_kernel(path, value, transpose=(2, 3, 1, 0)):
        node = ensure(params, path[:-1])
        node.setdefault(path[-1], {})["kernel"] = jnp.asarray(
            _np.transpose(arr(value), transpose)
        )

    def put_bias(path, value):
        node = ensure(params, path[:-1])
        node.setdefault(path[-1], {})["bias"] = jnp.asarray(arr(value))

    bn_params: dict = {}
    bn_stats: dict = {}

    def put_bn(path, stat, value):
        target = bn_stats if stat in ("mean", "var") else bn_params
        target.setdefault(tuple(path), {})[stat] = jnp.asarray(arr(value))

    # A DeformConv block's ``conv`` is the DeformConv2d kernel (flax
    # param "weight"/"bias" at block level); a plain block's ``conv``
    # is an ordinary conv (flax sub-module "conv").  Distinguish by the
    # presence of sibling offset keys.
    deform_blocks = {
        k.rsplit(".offset.", 1)[0] for k in items if ".offset." in k
    }

    for key, value in items.items():
        if key.startswith("base."):
            continue
        tokens = key.split(".")
        if tokens[0] == "dla_up":
            block_path = tokens[:3]   # dla_up, ida_i, {proj|up|node}_j
            rest = tokens[3:]
        elif tokens[0] == "ida_up":
            block_path = tokens[:2]
            rest = tokens[2:]
        elif tokens[0].isdigit():
            # Head Sequential: {idx}.0 = 3x3 conv, {idx}.2 = 1x1 conv.
            head_i, seq_i, stat = tokens
            name = (f"head_{head_i}_conv" if seq_i == "0"
                    else f"head_{head_i}_out")
            if stat == "weight":
                put_kernel([name], value)
            else:
                put_bias([name], value)
            continue
        else:
            raise ValueError(f"unrecognized checkpoint key: {key}")

        if rest == ["weight"] and block_path[-1].startswith("up_"):
            # Grouped ConvTranspose2d bilinear upsample [C,1,k,k].
            put_kernel(block_path, value)
            continue
        sub, stat = rest[0], rest[-1]
        if sub == "offset":
            (put_kernel if stat == "weight" else put_bias)(
                block_path + ["offset"], value
            )
        elif sub == "mask":
            (put_kernel if stat == "weight" else put_bias)(
                block_path + ["mask"], value
            )
        elif sub == "conv":
            # Membership check: the torch key minus ".conv.<stat>".
            is_deform = key.rsplit(".conv.", 1)[0] in deform_blocks
            if is_deform:
                node = ensure(params, block_path)
                if stat == "weight":
                    node["weight"] = jnp.asarray(
                        _np.transpose(arr(value), (2, 3, 1, 0))
                    )
                else:
                    node["bias"] = jnp.asarray(arr(value))
            else:
                (put_kernel if stat == "weight" else put_bias)(
                    block_path + ["conv"], value
                )
        elif sub == "actf":
            stat_name = {
                "weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var",
            }.get(stat)
            if stat_name is not None:  # num_batches_tracked: dropped
                put_bn(block_path + ["bn"], stat_name, value)
        elif stat == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"unrecognized checkpoint key: {key}")

    for path, parts in bn_params.items():
        ensure(params, list(path)[:-1])[path[-1]] = parts
    for path, parts in bn_stats.items():
        ensure(stats, list(path)[:-1])[path[-1]] = parts

    return {"params": {"model": params}, "batch_stats": {"model": stats}}
