"""Equivalence: Pallas depthwise upsample vs the dilated lowering.

The serving CN aggregation stage upsamples with trainable bilinear
depthwise transposed convs (models/centerpoint_dla.DepthwiseUpsample,
reference centerpoint_dla.py:334,411-462).  The Pallas kernel
(ops/pallas/depthwise_upsample.py) must match the dilated form — the
certified lowering — to f32 exactness on random kernels, not just the
bilinear init, because the reference trains these weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.ops.pallas.depthwise_upsample import (
    depthwise_upsample_pallas,
)


def _dilated(x, kernel, f):
    k = 2 * f
    pad = k - 1 - f // 2
    flipped = jnp.flip(kernel, axis=(0, 1))
    return jax.lax.conv_general_dilated(
        x, flipped, (1, 1), ((pad, pad), (pad, pad)),
        lhs_dilation=(f, f),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


@pytest.mark.parametrize("f,h,w,c", [(2, 5, 7, 8), (4, 3, 5, 16)])
def test_pallas_depthwise_upsample_matches_dilated(f, h, w, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    kern = jnp.asarray(
        rng.standard_normal((2 * f, 2 * f, 1, c)), jnp.float32
    )
    ref = _dilated(x, kern, f)
    got = depthwise_upsample_pallas(x, kern, f, interpret=True)
    assert got.shape == (2, f * h, f * w, c)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pallas_depthwise_upsample_bilinear_init_bf16():
    """The served configuration: bilinear kernel, bf16 activations."""
    from tauv_vision_tpu.models.centerpoint_dla import _bilinear_kernel

    f, h, w, c = 2, 6, 10, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.bfloat16)
    kern = jnp.asarray(
        np.broadcast_to(
            np.asarray(_bilinear_kernel(2 * f))[:, :, None, None],
            (2 * f, 2 * f, 1, c),
        ),
        jnp.bfloat16,
    )
    ref = _dilated(x, kern, f)
    got = depthwise_upsample_pallas(x, kern, f, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
