"""DLA-34 backbone and deformable-conv tests."""

from math import pi

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.configs import AngleConfig, ObjectConfig, ObjectConfigSet
from tauv_vision_tpu.models.centerpoint_dla import (
    CenterpointDLA34,
    DepthwiseUpsample,
    DLATrunk,
    _bilinear_kernel,
)
from tauv_vision_tpu.ops.deform_conv import deform_conv2d


def _numpy_deform_conv(x, offset, mask, weight, bias, stride=1, padding=1):
    """Direct numpy restatement of torchvision deform_conv2d semantics."""
    b, h, w, c = x.shape
    kh, kw, _, oc = weight.shape
    ho = (h + 2 * padding - (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - (kw - 1) - 1) // stride + 1
    out = np.zeros((b, ho, wo, oc), np.float32)

    def sample(bi, y, x_):
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        acc = np.zeros(c, np.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xx = y0 + dy, x0 + dx
                wy = 1 - abs(y - yy)
                wx = 1 - abs(x_ - xx)
                if 0 <= yy < h and 0 <= xx < w and wy > 0 and wx > 0:
                    acc += wy * wx * x[bi, yy, xx]
        return acc

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for tap in range(kh * kw):
                    ky, kx = tap // kw, tap % kw
                    py = oy * stride - padding + ky + offset[bi, oy, ox, 2 * tap]
                    px = ox * stride - padding + kx + offset[bi, oy, ox, 2 * tap + 1]
                    s = sample(bi, py, px) * mask[bi, oy, ox, tap]
                    out[bi, oy, ox] += s @ weight[ky, kx]
    return out + bias


def test_deform_conv_matches_numpy_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 6, 7, 3)).astype(np.float32)
    offset = rng.normal(size=(1, 6, 7, 18)).astype(np.float32) * 0.7
    mask = rng.uniform(0.2, 1.0, (1, 6, 7, 9)).astype(np.float32)
    weight = rng.normal(size=(3, 3, 3, 4)).astype(np.float32) * 0.3
    bias = rng.normal(size=(4,)).astype(np.float32)

    ours = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias),
        )
    )
    expected = _numpy_deform_conv(x, offset, mask, weight, bias)
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_deform_conv_zero_offset_equals_conv():
    """With zero offsets and unit mask, DCN == plain 3x3 conv."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    weight = rng.normal(size=(3, 3, 4, 5)).astype(np.float32) * 0.3
    offset = np.zeros((2, 8, 8, 18), np.float32)
    mask = np.ones((2, 8, 8, 9), np.float32)

    ours = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), None,
        )
    )
    expected = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(ours, np.asarray(expected), atol=1e-4)


def test_bilinear_upsample_kernel_and_shape():
    k = _bilinear_kernel(4)
    assert k.shape == (4, 4)
    np.testing.assert_allclose(k[1, 1], k[2, 2], atol=1e-6)  # symmetric

    module = DepthwiseUpsample(factor=2)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 5, 6, 3)),
                    jnp.float32)
    variables = module.init(jax.random.key(0), x)
    y = module.apply(variables, x)
    assert y.shape == (1, 10, 12, 3)
    # Constant input stays constant in the interior (bilinear property).
    const = module.apply(variables, jnp.ones((1, 5, 6, 3)))
    np.testing.assert_allclose(np.asarray(const[0, 4:6, 4:6, 0]), 1.0, atol=1e-5)


def test_dla_trunk_level_shapes():
    model = DLATrunk()
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), img)
    levels = model.apply(variables, img)
    assert [lv.shape for lv in levels] == [
        (1, 64, 64, 16), (1, 32, 32, 32), (1, 16, 16, 64),
        (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512),
    ]


@pytest.mark.slow
def test_centerpoint_dla34_prediction_shapes():
    oc = ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="torpedo",
                yaw=AngleConfig(train=True, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=True,
                train_keypoints=True,
                keypoints=((0, 0, 0), (0.1, 0, 0)),
            ),
        )
    )
    model = CenterpointDLA34(object_config=oc, head_conv=32)
    img = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.key(0), img, train=False)
    pred = model.apply(variables, img, train=False)
    assert pred.heatmap.shape == (1, 16, 24, 1)
    assert pred.keypoint_heatmap.shape == (1, 16, 24, 2)
    assert pred.keypoint_affinity.shape == (1, 16, 24, 2, 2)
    assert pred.size.shape == (1, 16, 24, 2)
    assert pred.yaw_bin.shape == (1, 16, 24, 4)
    assert pred.depth.shape == (1, 16, 24, 1)
    assert pred.roll_bin is None
    # Focal bias init on both heatmap heads.
    assert float(jax.nn.sigmoid(pred.heatmap).mean()) < 0.4


def test_merged_offset_mask_bit_identical():
    """DeformConvBlock(merge_offset_mask=True) — the serving default,
    one 27-channel conv for offset+mask — must be BIT-identical to the
    two-conv form (each output channel contracts the same taps; only
    the MXU lane padding changes).  Randomized params so the zero init
    doesn't mask a kernel-ordering bug."""
    from tauv_vision_tpu.models.centerpoint_dla import DeformConvBlock

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 16)), jnp.float32)
    block = DeformConvBlock(
        out_channels=12, deform=True, dcn_impl="gather",
        offset_bound=1.0, merge_offset_mask=True,
    )
    variables = block.init(jax.random.key(0), x, train=False)
    variables = {
        "params": jax.tree_util.tree_map(
            lambda v: jnp.asarray(
                rng.standard_normal(v.shape) * 0.1, v.dtype
            ),
            variables["params"],
        ),
        # batch_stats stay at init (var must remain positive).
        **{k: v for k, v in variables.items() if k != "params"},
    }
    block_two = DeformConvBlock(
        out_channels=12, deform=True, dcn_impl="gather",
        offset_bound=1.0, merge_offset_mask=False,
    )
    merged = block.apply(variables, x, train=False)
    two = block_two.apply(variables, x, train=False)
    assert jnp.array_equal(merged, two), float(
        jnp.max(jnp.abs(merged - two))
    )


@pytest.mark.slow
def test_bn_out_bf16_close_to_f32_flow():
    """bn_out=bf16 rounds every BatchNorm output once (the round-4 HBM
    lever); with shared params the heads must stay within bf16-rounding
    distance of the exact f32-flow model.  The decoded-delta
    certification at production scale is quantize_accuracy_check's
    flax-bf16-bn16 rung."""
    oc = ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="torpedo",
                yaw=AngleConfig(train=True, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=True,
                train_keypoints=False,
                keypoints=(),
            ),
        )
    )
    import numpy as np

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    base = CenterpointDLA34(
        object_config=oc, head_conv=32, dtype=jnp.bfloat16, deform=False
    )
    variables = base.init(jax.random.key(0), img, train=False)
    ref = base.apply(variables, img, train=False)
    b16 = CenterpointDLA34(
        object_config=oc, head_conv=32, dtype=jnp.bfloat16, deform=False,
        bn_out=jnp.bfloat16,
    ).apply(variables, img, train=False)
    for field in ("heatmap", "size", "offset", "depth"):
        r = np.asarray(getattr(ref, field), np.float32)
        g = np.asarray(getattr(b16, field), np.float32)
        assert g.shape == r.shape, field
        denom = np.abs(r).max() + 1e-9
        # one extra bf16 rounding per BN in an already-bf16 conv graph
        assert np.abs(g - r).max() / denom < 0.03, (
            field, np.abs(g - r).max() / denom
        )


def test_bn_out_bf16_trunk_guard_fast():
    """Fast-suite guard for the bn_out=bf16 mechanism (ADVICE r4): the
    full-model check above is slow-marked, but bn16 is the DEFAULT
    serving path since round 4, so a shrunken variant must stay in the
    fast suite.  A tiny trunk exercises the same _bn plumbing through
    BasicBlock/Root/Tree with shared params."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    tiny = dict(levels=(1, 1, 1, 2, 2, 1), channels=(4, 8, 8, 16, 16, 32))
    base = DLATrunk(**tiny, dtype=jnp.bfloat16)
    variables = base.init(jax.random.key(0), img, train=False)
    ref = base.apply(variables, img, train=False)
    b16 = DLATrunk(**tiny, dtype=jnp.bfloat16, bn_out=jnp.bfloat16).apply(
        variables, img, train=False
    )
    for i, (r, g) in enumerate(zip(ref, b16)):
        r = np.asarray(r, np.float32)
        g = np.asarray(g, np.float32)
        assert g.shape == r.shape, i
        denom = np.abs(r).max() + 1e-9
        assert np.abs(g - r).max() / denom < 0.03, (
            i, np.abs(g - r).max() / denom
        )


def test_f32_stem_trunk_guard_fast():
    """Fast-suite guard for the f32-stem default serving rung (round
    5): with ``f32_stages=("stem",)`` the bf16 trunk's stem conv + BN
    run in full f32, which must pull the trunk strictly closer to the
    all-f32 flow than the plain-bf16 stem does (the mechanism behind
    the score-p95 2.82e-3 -> 9.0e-4 collapse, PARITY.md round 5)."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    tiny = dict(levels=(1, 1, 1, 2, 2, 1), channels=(4, 8, 8, 16, 16, 32))
    base = DLATrunk(**tiny, dtype=jnp.float32)
    variables = base.init(jax.random.key(1), img, train=False)
    f32_outs = base.apply(variables, img, train=False)

    def worst_rel(outs):
        worst = 0.0
        for r, g in zip(f32_outs, outs):
            r = np.asarray(r, np.float32)
            g = np.asarray(g, np.float32)
            worst = max(
                worst,
                float(np.abs(g - r).max() / (np.abs(r).max() + 1e-9)),
            )
        return worst

    bf16 = worst_rel(DLATrunk(**tiny, dtype=jnp.bfloat16).apply(
        variables, img, train=False
    ))
    stem32 = worst_rel(DLATrunk(
        **tiny, dtype=jnp.bfloat16, f32_stages=("stem",)
    ).apply(variables, img, train=False))
    assert stem32 < bf16, (stem32, bf16)
    assert stem32 < 0.03, stem32
