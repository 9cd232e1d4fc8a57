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
