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


def test_shift_dcn_fractional_radius_exact():
    """Fractional max_offset shrinks the shift window ([-1, 1] for
    r=0.5) while staying exact for offsets inside the bound."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 6)).astype(np.float32))
    off = jnp.asarray(
        rng.uniform(-0.5, 0.5, (2, 7, 9, 18)).astype(np.float32)
    )
    mask = jnp.asarray(rng.uniform(0, 1, (2, 7, 9, 9)).astype(np.float32))
    wgt = jnp.asarray(
        (rng.standard_normal((3, 3, 6, 5)) * 0.2).astype(np.float32)
    )
    a = deform_conv2d(x, off, mask, wgt, None)
    b = deform_conv2d_shift(x, off, mask, wgt, None, max_offset=0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_deform_block_offset_bound():
    """DeformConvBlock(offset_bound=r) squashes raw offsets through
    r*tanh(./r): the sown offsets are strictly inside the bound, so the
    r-window kernels are exact by construction."""
    import jax

    from tauv_vision_tpu.models.centerpoint_dla import DeformConvBlock

    block = DeformConvBlock(
        out_channels=8, deform=True, dcn_impl="gather", offset_bound=0.5
    )
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    variables = block.init(jax.random.key(0), x, train=False)
    # Force large raw offsets through the offset conv kernel.
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    params = dict(variables["params"])
    params["offset"] = {
        "kernel": jnp.ones_like(variables["params"]["offset"]["kernel"]),
        "bias": jnp.full_like(variables["params"]["offset"]["bias"], 3.0),
    }
    out, state = block.apply(
        {**variables, "params": params}, x, train=False,
        mutable=["intermediates"],
    )
    sown = state["intermediates"]["dcn_offset"][0]
    assert float(jnp.max(jnp.abs(sown))) <= 0.5
    assert out.shape == (1, 6, 6, 8)
