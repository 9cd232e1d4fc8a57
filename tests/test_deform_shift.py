"""Shift-window DCN correctness vs the gather reference implementation."""

import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_shift


def _case(seed, b=2, h=10, w=12, c=5, o=6, off_scale=1.0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    off = jnp.asarray(
        (rng.normal(size=(b, h, w, 18)) * off_scale).astype(np.float32)
    )
    mask = jnp.asarray(rng.uniform(0.2, 1, (b, h, w, 9)).astype(np.float32))
    wgt = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.3).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    return x, off, mask, wgt, bias


def test_shift_dcn_exact_for_bounded_offsets():
    x, off, mask, wgt, bias = _case(0)
    off = jnp.clip(off, -2.5, 2.5)
    a = deform_conv2d(x, off, mask, wgt, bias)
    b = deform_conv2d_shift(x, off, mask, wgt, bias, max_offset=3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_shift_dcn_zero_offset_is_conv():
    x, _, _, wgt, bias = _case(1)
    off = jnp.zeros((2, 10, 12, 18))
    mask = jnp.ones((2, 10, 12, 9))
    a = deform_conv2d(x, off, mask, wgt, bias)
    b = deform_conv2d_shift(x, off, mask, wgt, bias, max_offset=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_shift_dcn_no_mask():
    x, off, _, wgt, _ = _case(2)
    off = jnp.clip(off, -1.5, 1.5)
    a = deform_conv2d(x, off, None, wgt, None)
    b = deform_conv2d_shift(x, off, None, wgt, None, max_offset=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_shift_dcn_clips_large_offsets_to_zero_contribution():
    """|offset| > max_offset contributes zero (documented deviation)."""
    x, _, _, wgt, _ = _case(3)
    off = jnp.full((2, 10, 12, 18), 10.0)  # way out of window
    mask = jnp.ones((2, 10, 12, 9))
    out = deform_conv2d_shift(x, off, mask, wgt, None, max_offset=2)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)
