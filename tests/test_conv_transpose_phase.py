"""Phase-decomposed transposed conv (ops/conv_transpose.py) must match
the torch-exact dilated formulation (models/layers.TorchConvTranspose)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.models.layers import TorchConvTranspose
from tauv_vision_tpu.ops.conv_transpose import (
    conv_transpose_phase,
    quantized_conv_transpose_phase,
)


@pytest.mark.parametrize(
    "k,s,p,op,h,w,cin,cout",
    [
        (3, 2, 1, 1, 9, 10, 8, 8),   # protonet upsampler configuration
        (2, 2, 0, 0, 6, 6, 4, 8),
        (4, 2, 1, 0, 7, 5, 4, 4),
        (3, 3, 1, 1, 5, 6, 4, 4),
    ],
)
def test_phase_matches_dilated(k, s, p, op, h, w, cin, cout):
    rng = np.random.default_rng(0)
    module = TorchConvTranspose(
        cout, kernel_size=k, stride=s, padding=p, output_padding=op
    )
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    variables = module.init(jax.random.key(1), x)

    ref = module.apply(variables, x)
    got = conv_transpose_phase(
        x, variables["params"]["kernel"], s, p, op,
        bias=variables["params"]["bias"],
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_quantized_phase_matches_dilated_int8():
    """The int8 phase path reproduces the int8 dilated path: identical
    quantized operands, different schedule."""
    rng = np.random.default_rng(1)
    cin = cout = 8
    x = jnp.asarray(rng.standard_normal((2, 9, 10, cin)).astype(np.float32))
    kernel = jnp.asarray(
        (rng.standard_normal((3, 3, cin, cout)) * 0.3).astype(np.float32)
    )
    act_scale = float(jnp.abs(x).max() / 127.0)

    got = quantized_conv_transpose_phase(
        x, kernel, 2, 1, 1, act_scale
    )

    # Dilated int8 reference (the pre-round-2 serving path).
    w_absmax = jnp.max(jnp.abs(kernel.reshape(-1, cout)), axis=0)
    w_scale = jnp.maximum(w_absmax, 1e-6) / 127.0
    q_kernel = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(
        jnp.int8
    )
    q_x = jnp.clip(jnp.round(x / act_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        q_x, jnp.flip(q_kernel, axis=(0, 1)), (1, 1),
        ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    ref = acc.astype(jnp.float32) * (act_scale * w_scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_depthwise_phase_matches_dilated():
    """conv_transpose_phase with feature_group_count=C vs the dilated
    depthwise form (the DepthwiseUpsample configuration: k=2f, p=f//2)."""
    import jax

    from tauv_vision_tpu.ops.conv_transpose import conv_transpose_phase

    rng = np.random.default_rng(5)
    for f in (2, 4):
        k = 2 * f
        c = 6
        x = jnp.asarray(rng.normal(size=(2, 5, 7, c)).astype(np.float32))
        kernel = jnp.asarray(
            rng.normal(size=(k, k, 1, c)).astype(np.float32)
        )
        pad = k - 1 - f // 2
        ref = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=(0, 1)), (1, 1),
            ((pad, pad), (pad, pad)), lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        got = conv_transpose_phase(
            x, kernel, stride=f, padding=f // 2, output_padding=0,
            feature_group_count=c,
        )
        assert got.shape == ref.shape, (f, got.shape, ref.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("f,h,w,c", [
    (2, 12, 20, 256),   # dla_up ida_0 upsample site
    (2, 23, 40, 128),   # dla_up ida_1
    (2, 45, 80, 64),    # dla_up ida_2 / final IDA f=2
    (4, 23, 40, 64),    # final IDA f=4
    (2, 7, 9, 16),      # odd small
])
def test_depthwise_upsample_block_matches_dilated(f, h, w, c):
    """The block-phase lowering (ops/conv_transpose.
    depthwise_upsample_block) is the dilated depthwise ConvTranspose
    exactly — random TRAINED-like kernels, not just the bilinear init,
    since DepthwiseUpsample's kernel is a trainable parameter."""
    from tauv_vision_tpu.models.centerpoint_dla import DepthwiseUpsample

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, h, w, c)).astype(np.float32))

    dilated = DepthwiseUpsample(f, impl="dilated")
    block = DepthwiseUpsample(f, impl="block")
    variables = dilated.init(jax.random.key(0), x)
    # overwrite the bilinear init with random trained-like weights
    variables = {
        "params": {
            "kernel": jnp.asarray(
                rng.standard_normal(
                    variables["params"]["kernel"].shape
                ).astype(np.float32)
            )
        }
    }

    ref = np.asarray(dilated.apply(variables, x))
    got = np.asarray(block.apply(variables, x))
    assert got.shape == ref.shape == (3, f * h, f * w, c)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_depthwise_upsample_block_bf16_close():
    """bf16 serving dtype: both lowerings do f32 products/accumulation
    over bf16 tap values, so they agree to bf16 ulp order."""
    from tauv_vision_tpu.models.centerpoint_dla import DepthwiseUpsample

    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.standard_normal((2, 23, 40, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)

    dilated = DepthwiseUpsample(2, impl="dilated", dtype=jnp.bfloat16)
    block = DepthwiseUpsample(2, impl="block", dtype=jnp.bfloat16)
    variables = dilated.init(jax.random.key(0), x)

    ref = np.asarray(dilated.apply(variables, x), np.float32)
    got = np.asarray(block.apply(variables, x), np.float32)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 0.01 * scale


def test_model_up_impl_block_equivalence():
    """Whole-model: CenterpointDLA34(up_impl='block') reproduces the
    default forward from the SAME variables (the switch only changes
    the upsample lowering, not parameters)."""
    from math import pi

    from tauv_vision_tpu.configs import (
        AngleConfig,
        CenternetModelConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34

    oc = ObjectConfigSet(configs=(ObjectConfig(
        id="o", yaw=AngleConfig(train=False, modulo=2 * pi),
        pitch=AngleConfig(train=False, modulo=2 * pi),
        roll=AngleConfig(train=False, modulo=2 * pi),
        train_depth=False, train_keypoints=False, keypoints=None,
    ),))
    a = CenterpointDLA34(object_config=oc, deform=False)
    b = CenterpointDLA34(object_config=oc, deform=False, up_impl="block")

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32))
    variables = a.init(jax.random.key(1), x, train=False)

    pa = a.apply(variables, x, train=False)
    pb = b.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(pb.heatmap), np.asarray(pa.heatmap), rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pb.size), np.asarray(pa.size), rtol=1e-4, atol=1e-4,
    )
