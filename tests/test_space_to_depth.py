"""Exactness of the space-to-depth stem conv rewrite
(ops/space_to_depth.py): the folded conv must reproduce the original
``lax.conv_general_dilated`` bit-for-bit in f32 up to summation order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.ops.space_to_depth import (
    conv_s2d,
    depth_to_space,
    fold_conv_s2d,
    space_to_depth,
)


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))
    for f in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x, f), f)),
            np.asarray(x),
        )


@pytest.mark.parametrize(
    "kh,cin,cout,stride,f,h,w",
    [
        (7, 3, 16, 1, 2, 24, 32),   # CenterNet DLA-34 stem shape class
        (7, 3, 16, 1, 4, 24, 32),
        (7, 3, 64, 2, 2, 24, 32),   # ResNet stem shape class
        (7, 3, 64, 2, 4, 24, 32),
        (3, 16, 16, 1, 2, 16, 16),  # DLA level-0 conv shape class
        (3, 16, 32, 2, 2, 16, 16),  # DLA level-1 stride-2 conv
        (5, 4, 8, 1, 2, 20, 20),
    ],
)
def test_fold_conv_s2d_exact(kh, cin, cout, stride, f, h, w):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    k = rng.standard_normal((kh, kh, cin, cout)).astype(np.float32)

    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (stride, stride), ((kh // 2, kh // 2),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    folded, pad, po = fold_conv_s2d(k, f, stride, kh // 2)
    got = conv_s2d(x, jnp.asarray(folded), f, pad, po)

    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_s2d_stem_module_matches_plain_conv():
    """S2DStemConv (models/layers.py) == nn.Conv with the same kernel."""
    import flax.linen as nn

    from tauv_vision_tpu.models.layers import S2DStemConv

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 3)).astype(np.float32))
    module = S2DStemConv(8, 7, stride=1, f=4)
    variables = module.init(jax.random.key(0), x)
    got = module.apply(variables, x)

    ref = jax.lax.conv_general_dilated(
        x, variables["params"]["kernel"], (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_s2d_stem_int8_path():
    """The quantize interceptor routes S2DStemConv through the int8
    phase form; output stays close to the float stem."""
    from tauv_vision_tpu.models.layers import S2DStemConv
    from tauv_vision_tpu.serving.quantize import calibrate, quantized_call

    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.uniform(-2, 2, (2, 16, 24, 3)).astype(np.float32)
    )
    module = S2DStemConv(8, 7, stride=1, f=2)
    variables = module.init(jax.random.key(0), x)

    apply_fn = lambda b: module.apply(variables, b)  # noqa: E731
    scales = calibrate(apply_fn, [x])
    assert len(scales) == 1, "stem must be calibrated despite C_in=3"
    q_out = quantized_call(apply_fn, scales)(x)
    f_out = apply_fn(x)
    err = np.abs(np.asarray(q_out) - np.asarray(f_out)).max()
    scale = float(np.abs(np.asarray(f_out)).max())
    assert err < 0.05 * scale, (err, scale)
