"""Cross-validation of the two DCNv2 implementations used for the
reference-with-DeformConv comparison (VERDICT r2 item 2b):

- the pure-torch torchvision.ops.DeformConv2d drop-in
  (compare_reference_accuracy.make_torch_deform_conv2d), which stands
  in for torchvision in the offline reference runs, and
- ops/deform_conv.deform_conv2d, the jax gather formulation the DCN
  parity suite is anchored on.

Both claim torchvision's documented semantics; agreeing with each other
on random offsets/masks (including out-of-bounds samples) is the
evidence the torch drop-in is a faithful stand-in.
"""

import numpy as np
import torch

from tauv_vision_tpu.ops.deform_conv import deform_conv2d
from tauv_vision_tpu.scripts.compare_reference_accuracy import (
    make_torch_deform_conv2d,
)


def test_torch_dcn_matches_jax_gather():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, h, w, c, o = 2, 9, 11, 6, 5
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # offsets up to +-2.5: in-bounds, fractional, and out-of-bounds taps
    offset = (rng.uniform(-2.5, 2.5, (b, h, w, 18))).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32)
    weight = rng.normal(size=(3, 3, c, o)).astype(np.float32) * 0.2
    bias = rng.normal(size=(o,)).astype(np.float32)

    ours = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), stride=1, padding=1,
    ))

    DeformConv2d = make_torch_deform_conv2d()
    m = DeformConv2d(c, o, kernel_size=3, stride=1, padding=1)
    with torch.no_grad():
        m.weight.copy_(
            torch.from_numpy(np.transpose(weight, (3, 2, 0, 1)))
        )
        m.bias.copy_(torch.from_numpy(bias))
        theirs = m(
            torch.from_numpy(np.moveaxis(x, -1, 1)),
            torch.from_numpy(np.moveaxis(offset, -1, 1)),
            torch.from_numpy(np.moveaxis(mask, -1, 1)),
        ).numpy()
    theirs = np.moveaxis(theirs, 1, -1)

    assert ours.shape == theirs.shape == (b, h, w, o)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_torch_dcn_zero_offset_is_plain_conv():
    """With zero offsets and unit mask, DCNv2 must equal a plain 3x3
    conv — pins the tap indexing."""
    rng = np.random.default_rng(1)
    b, h, w, c, o = 1, 8, 8, 4, 3
    x = rng.normal(size=(b, c, h, w)).astype(np.float32)
    DeformConv2d = make_torch_deform_conv2d()
    m = DeformConv2d(c, o)
    with torch.no_grad():
        out = m(
            torch.from_numpy(x),
            torch.zeros(b, 18, h, w),
            torch.ones(b, 9, h, w),
        )
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), m.weight, m.bias, padding=1
        )
    np.testing.assert_allclose(out.numpy(), ref.numpy(), atol=1e-5)
