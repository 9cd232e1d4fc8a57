"""Phase-decomposed transposed convolution.

``TorchConvTranspose`` (models/layers.py) implements
``torch.nn.ConvTranspose2d`` as a correlation over the ``lhs_dilation``-
dilated input — torch-exact, but the dilated tensor is 3/4 zeros at
stride 2, and on TPU the int8 path pays for every zero.  A stride-s
transposed conv decomposes EXACTLY into s*s independent stride-1 convs,
one per output phase, each consuming the raw (undilated) input with a
subsampled kernel:

  out[s*Y + a, s*X + b] = sum_{ky = pad_lo - a (mod s)} ...
    flipped[ky, kx] * in[Y + (ky + a - pad_lo)/s, X + ...]

so phase (a, b) is a conv with the kernel taps ky ≡ (pad_lo - a) mod s
(consecutive input offsets), then the phases interleave via
depth-to-space.  No zeros anywhere; the int8 quantized form runs s*s
dense int8 convs on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.ops.space_to_depth import depth_to_space


def _phase_taps(k: int, s: int, pad_lo: int, a: int):
    """Kernel tap rows for output phase ``a`` and their input offsets."""
    kys = [ky for ky in range(k) if (ky + a - pad_lo) % s == 0]
    ds = [(ky + a - pad_lo) // s for ky in kys]
    return kys, ds


def conv_transpose_phase(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
    padding: int,
    output_padding: int,
    bias: Optional[jnp.ndarray] = None,
    preferred_element_type=None,
    feature_group_count: int = 1,
) -> jnp.ndarray:
    """torch ConvTranspose2d(x, kernel HWIO [k, k, Cin/g, Cout]) via
    phase decomposition; matches models/layers.TorchConvTranspose
    exactly.  ``feature_group_count=C`` gives the depthwise form
    (models/centerpoint_dla.DepthwiseUpsample's bilinear upsampler),
    where skipping the dilation zeros pays off most: the dilated
    depthwise conv does s*s times the work of its nonzero taps on the
    VPU with no MXU to hide it."""
    b_, h, w, _ = x.shape
    k = kernel.shape[0]
    s = stride
    pad_lo = k - 1 - padding
    target_h = (h - 1) * s - 2 * padding + k + output_padding
    target_w = (w - 1) * s - 2 * padding + k + output_padding
    assert target_h <= s * h and target_w <= s * w, (
        "phase decomposition covers out sizes <= stride * in"
    )

    flipped = jnp.flip(kernel, axis=(0, 1))
    extra = {}
    if preferred_element_type is not None:
        extra["preferred_element_type"] = preferred_element_type

    phases = []
    for a in range(s):
        kys, dys = _phase_taps(k, s, pad_lo, a)
        for bph in range(s):
            kxs, dxs = _phase_taps(k, s, pad_lo, bph)
            sub = flipped[np.ix_(kys, kxs)]  # [ka, kb, Cin/g, Cout]
            out_ab = jax.lax.conv_general_dilated(
                x,
                sub.astype(x.dtype),
                window_strides=(1, 1),
                padding=(
                    (-min(dys), max(dys)),
                    (-min(dxs), max(dxs)),
                ),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=feature_group_count,
                **extra,
            )
            phases.append(out_ab)

    out = jnp.concatenate(phases, axis=-1)   # phase-major (a, b, c)
    out = depth_to_space(out, s)
    out = out[:, :target_h, :target_w]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def quantized_conv_transpose_phase(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
    padding: int,
    output_padding: int,
    act_scale: float,
    bias: Optional[jnp.ndarray] = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """int8 x int8 -> int32 phase-decomposed transposed conv with
    per-output-channel weight scales (the serving/quantize.py contract)."""
    kernel = kernel.astype(jnp.float32)
    c_out = kernel.shape[-1]
    w_absmax = jnp.max(jnp.abs(kernel.reshape(-1, c_out)), axis=0)
    w_scale = jnp.maximum(w_absmax, 1e-6) / 127.0
    q_kernel = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(
        jnp.int8
    )
    q_x = jnp.clip(
        jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
    ).astype(jnp.int8)

    acc = conv_transpose_phase(
        q_x, q_kernel, stride, padding, output_padding,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (act_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
