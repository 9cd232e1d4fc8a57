"""Exact space-to-depth (phase) reformulation of small-channel convs.

The camera-facing stems (7x7 conv from 3 RGB channels:
``centerpoint_dla.py:237`` base_layer, torchvision ResNet ``conv1`` used
at ``yolact/model/backbone.py:13``) feed the 128-wide MXU 3 input
channels, so XLA runs them at ~13% of peak — measured 5.2 ms of a 52 ms
CenterNet batch.  This module rewrites such convs EXACTLY (same math,
same weights, reindexed) into convs over a space-to-depth input:

  in_s2d[Y, X, (a, b, c)] = in[f*Y + a, f*X + b, c]

A k x k conv over the original image becomes a smaller conv over the
phase tensor whose input-feature dim is ``f*f*C_in`` — MXU-friendly —
with the kernel entries scattered by phase arithmetic:

  out[f*Yo + ao] reads in[f*Yo + ao + dy] = in_s2d[Yo + ty, phase ai]
  with  ty = floor((ao + dy)/f),  ai = (ao + dy) mod f

so K_s2d[ty, tx, (ai,bi,ci), (ao,bo,co)] = K[dy, dx, ci, co] where
dy = f*ty + ai - ao (zero when |dy| > radius).  The transform trades a
modest MAC increase (2-3x for f in {2,4}) for ~8x better MXU feeding —
a large net win for C_in=3 stems (this is the standard TPU "space-to-
depth stem" trick, e.g. MLPerf ResNet, applied as an exact rewrite
instead of a retrained architecture change).

Supports stride 1 (phase outputs + depth-to-space) and stride s | f
(output phases collapse; fewer or no d2s phases needed).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/f, W/f, f*f*C]; phase-major channel order
    (a, b, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, H/f, W/f, a, b, c]
    return x.reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (phase-major channels)."""
    b, hf, wf, fc = x.shape
    c = fc // (f * f)
    x = x.reshape(b, hf, wf, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hf * f, wf * f, c)


def _fold_geometry(kh: int, f: int, stride: int):
    """Static geometry of the fold: returns (k_s2d, pad (lo, hi), po,
    dy_idx, dx_idx, valid) with the index arrays shaped
    [k_s2d, k_s2d, f*f, po*po] mapping each folded tap/phase slot to the
    original kernel tap (or invalid)."""
    assert kh % 2 == 1
    radius = kh // 2
    assert f % stride == 0
    po = f // stride

    q_min = -radius
    q_max = stride * (po - 1) + radius
    t_min = q_min // f
    t_max = q_max // f
    k_s2d = t_max - t_min + 1

    dy_idx = np.zeros((k_s2d, k_s2d, f * f, po * po), np.int32)
    dx_idx = np.zeros_like(dy_idx)
    valid = np.zeros(dy_idx.shape, bool)
    for ao in range(po):
        for bo in range(po):
            for dy in range(kh):
                for dx in range(kw_ := kh):
                    qy = stride * ao + dy - radius
                    qx = stride * bo + dx - radius
                    ty = qy // f - t_min
                    tx = qx // f - t_min
                    ai = qy % f
                    bi = qx % f
                    dy_idx[ty, tx, ai * f + bi, ao * po + bo] = dy
                    dx_idx[ty, tx, ai * f + bi, ao * po + bo] = dx
                    valid[ty, tx, ai * f + bi, ao * po + bo] = True
    return k_s2d, (-t_min, t_max), po, dy_idx, dx_idx, valid


def fold_conv_s2d_weights(
    kernel: jnp.ndarray, f: int, stride: int = 1, padding: int = 0
) -> Tuple[jnp.ndarray, Tuple[int, int], int]:
    """Traceable fold of an HWIO kernel (jnp; gradients flow through —
    usable inside a flax module so the param keeps its original [kh, kw,
    Cin, Cout] shape for checkpoints and torch importers).

    Returns ``(kernel_s2d, (pad_lo, pad_hi), po)`` like
    :func:`fold_conv_s2d`.
    """
    kh, kw, c_in, c_out = kernel.shape
    assert kh == kw and padding == kh // 2
    k_s2d, pad, po, dy_idx, dx_idx, valid = _fold_geometry(kh, f, stride)

    gathered = kernel[dy_idx, dx_idx]  # [K, K, f*f, po*po, Cin, Cout]
    gathered = jnp.where(valid[..., None, None], gathered, 0)
    # -> [K, K, f*f, Cin, po*po, Cout] -> [K, K, f*f*Cin, po*po*Cout]
    gathered = jnp.transpose(gathered, (0, 1, 2, 4, 3, 5))
    return (
        gathered.reshape(k_s2d, k_s2d, f * f * c_in, po * po * c_out),
        pad,
        po,
    )


def fold_conv_s2d(
    kernel: np.ndarray, f: int, stride: int = 1, padding: int = 0
) -> Tuple[np.ndarray, int, int]:
    """Fold a [kh, kw, Cin, Cout] HWIO kernel into its space-to-depth
    form.

    Returns ``(kernel_s2d [K, K, f*f*Cin, po*po*Cout], (pad_lo, pad_hi),
    po)`` where ``po = f // stride`` is the output phase factor (1 when
    the conv's stride equals f: the strided output IS the s2d grid).

    The folded conv runs with stride 1 on the s2d input and
    ``(pad_lo, pad_hi)`` padding (asymmetric when the folded tap range
    is); when ``po > 1`` its output must go through
    ``depth_to_space(out, po)``.  Requires ``stride | f`` and an odd
    ``kh == kw`` with ``padding == kh // 2`` (the stem configuration).
    """
    kh, kw, c_in, c_out = kernel.shape
    assert kh == kw and kh % 2 == 1 and padding == kh // 2
    assert f % stride == 0
    radius = kh // 2
    po = f // stride

    # Output pixel yo (original coords) = stride * (f//stride * Yo + ao)
    # for output phase ao in [0, po); it reads input rows
    # stride*(po*Yo + ao) + dy - radius.  In s2d coords that is row
    # Yo + ty, input phase ai, with
    #   q = stride*ao + dy - radius;  ty = floor(q/f);  ai = q mod f.
    q_min = -radius
    q_max = stride * (po - 1) + radius
    t_min = q_min // f  # floor
    t_max = q_max // f
    k_s2d = t_max - t_min + 1

    folded = np.zeros(
        (k_s2d, k_s2d, f * f * c_in, po * po * c_out), kernel.dtype
    )
    for ao in range(po):
        for bo in range(po):
            for dy in range(kh):
                for dx in range(kw):
                    qy = stride * ao + dy - radius
                    qx = stride * bo + dx - radius
                    ty = qy // f - t_min
                    tx = qx // f - t_min
                    ai = qy % f
                    bi = qx % f
                    folded[
                        ty, tx,
                        (ai * f + bi) * c_in:(ai * f + bi + 1) * c_in,
                        (ao * po + bo) * c_out:(ao * po + bo + 1) * c_out,
                    ] += kernel[dy, dx]
    return folded, (-t_min, t_max), po


def conv_s2d(
    x: jnp.ndarray,
    kernel_s2d: jnp.ndarray,
    f: int,
    pad_s2d: Tuple[int, int],
    po: int,
    preferred_element_type=None,
) -> jnp.ndarray:
    """Apply a folded stem conv: s2d -> conv -> (depth_to_space).

    ``x`` is the original [B, H, W, Cin] input (H, W divisible by f);
    output matches ``lax.conv_general_dilated(x, kernel, stride,
    padding=radius)`` exactly.
    """
    xs = space_to_depth(x, f)
    out = jax.lax.conv_general_dilated(
        xs, kernel_s2d.astype(xs.dtype) if preferred_element_type is None
        else kernel_s2d,
        window_strides=(1, 1),
        padding=(tuple(pad_s2d), tuple(pad_s2d)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        **(
            {"preferred_element_type": preferred_element_type}
            if preferred_element_type is not None else {}
        ),
    )
    if po > 1:
        out = depth_to_space(out, po)
    return out
