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


def depthwise_upsample_block(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    factor: int,
) -> jnp.ndarray:
    """Depthwise ConvTranspose(kernel=2f, stride=f, padding=f//2) as a
    BLOCK-phase sum: phases land in a ``(B, H, f, W, f, C)`` tensor
    whose axis order already matches the output raster, so the final
    depth-to-space is a pure reshape over adjacent axes — no transpose,
    no channel-major shuffle, none of the layout flip that made the
    channel-major phase form (``conv_transpose_phase`` +
    ``depth_to_space``) lose 15% whole-model despite a 37x standalone
    win (BENCH.md round-3 dead ends).

    For ``k == 2f`` every output phase has exactly 2 kernel taps per
    spatial dim at input offsets within {-1, 0, 1}, so the whole
    upsample is 9 shifted broadcast-FMAs over the once-padded input —
    zero dilation zeros (the dilated lowering wastes f^2 x the tap work
    on the VPU with no MXU to hide it).

    Matches ``models/centerpoint_dla.DepthwiseUpsample``'s dilated
    correlation (torch ConvTranspose2d parameterization,
    centerpoint_dla.py:334-344 fill_up_weights init) to bf16 ulp order;
    products and accumulation run in f32 like the XLA conv.

    x: ``(B, H, W, C)``; kernel: HWIO ``(k, k, 1, C)``; returns
    ``(B, f*H, f*W, C)``.
    """
    f = int(factor)
    k = int(kernel.shape[0])
    assert k == 2 * f, "block form covers the k == 2f bilinear family"
    assert kernel.shape[2] == 1, "depthwise kernels only"
    _, h, w, c = x.shape
    padding = f // 2
    pad_lo = k - 1 - padding

    flipped = jnp.flip(kernel[:, :, 0, :], axis=(0, 1))  # (k, k, C) f32

    # Static tap tables: phase a reads input rows Y + d for the two
    # offsets d in _phase_taps(...); with the input padded by one on
    # each side the padded-row shift p = d + 1 lands in {0, 1, 2}.
    # Scatter each phase's 2x2 tap weights into a dense (3, 3, f, f, C)
    # table indexed by (row shift, col shift) so ONE uniform 9-term
    # broadcast sum computes every phase at once (5/9 of the table is
    # structurally zero — weight-side zeros cost 9 vs 4 VPU FMAs per
    # output, nothing in HBM traffic, and keep the graph a single
    # fusable expression).
    taps = [_phase_taps(k, f, pad_lo, a) for a in range(f)]
    vtab = jnp.zeros((3, 3, f, f, c), flipped.dtype)
    for a, (kys, dys) in enumerate(taps):
        for bph, (kxs, dxs) in enumerate(taps):
            for ky, dy in zip(kys, dys):
                for kx, dx in zip(kxs, dxs):
                    vtab = vtab.at[dy + 1, dx + 1, a, bph, :].set(
                        flipped[ky, kx, :]
                    )

    # f32 products + f32 accumulation, matching the XLA conv's MXU/VPU
    # numerics on bf16 inputs; weights pass through the model dtype
    # first so both lowerings see identical tap values.
    xf = x.astype(jnp.float32)
    xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    vf = vtab.astype(jnp.float32)
    t = None
    for p in range(3):
        for q in range(3):
            term = (
                xp[:, p : p + h, None, q : q + w, None, :]
                * vf[p, q][None, None, :, None, :, :]
            )
            t = term if t is None else t + term
    return t.reshape(x.shape[0], f * h, f * w, c).astype(x.dtype)


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
