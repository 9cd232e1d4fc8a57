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
