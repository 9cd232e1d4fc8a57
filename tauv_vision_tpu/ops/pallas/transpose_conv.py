"""Pallas TPU kernel: int8 phase-exact k3 s2 transposed conv.

The YOLACT protonet carries two ConvTranspose 2x upsamples (kernel 3,
stride 2, padding 1, output_padding 1 — reference masknet.py:45-55,
rebuilt as models/layers.TorchConvTranspose).  The chain serving path
runs them as bf16 dilated correlations, which sit AT the bf16 zero-free
roof (BENCH.md round-4 stage table: up2 11.8 ms of the 131 ms
north-star batch, up1 2.9 ms) — but the int8 phase roof is ~2x lower
(5.5 ms for up2), and every XLA-level int8 formulation loses the gap
back to layout passes:

  - lhs-dilated int8 conv: ~1.4x SLOWER than bf16 (XLA skips dilation
    zeros in bf16 but the int8 path pays them);
  - merged-phase [2,2,C,4C] conv + depth-to-space: 16 uniform taps vs
    the 9 real ones (1.78x MACs) + a 1.9 GB d2s relayout = a wash
    (11.6-12.5 ms, scripts/transpose_lowering_probe.py);
  - exact-tap phase convs + concat: 5x slower (int32 phase concat +
    d2s dominate, round 3).

This kernel does the exact-tap math in VMEM and writes the interleaved
NHWC result directly, so none of those passes exist:

  - a k3 s2 p1 op1 transpose splits into FOUR output phases whose taps
    are 1x1 / 1x2 / 2x1 / 2x2 convs (9 taps total = the 3x3 kernel);
    each tap is a [rows*W, C] @ [C, C] int8 MXU matmul on a statically
    shifted input view;
  - phases interleave via stack+reshape on the sublane/major dims
    (channels stay the lane dim throughout — the memory-order-
    preserving trick proven in ops/pallas/depthwise_upsample.py);
  - the epilogue (per-output-channel dequant, bias, leaky-relu, int8
    requantization into the NEXT conv's scale) fuses into the same
    program, so the 2x-upsampled activation map crosses HBM exactly
    once, as int8 — half the bf16 form's dominant write traffic;
  - grid is (batch, H/rows): each program computes a full-width strip
    of output row pairs; the one-row halo the odd phases need arrives
    as a second block spec pinned to the strip below (clamped + zeroed
    at the bottom edge).

Exactness: integer accumulation is associative, so the phase GEMMs
reproduce the lhs-dilated int8 accumulator BIT-FOR-BIT; the epilogue
applies the same f32 ops in the same order as
serving/quantize_chain.run_layer's quantized branch.  The equivalence
test (tests/test_pallas_transpose_conv.py) asserts bit-equality against
that XLA int8-sim reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def phase_tap_matrices(qk: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, C] HWIO int8 kernel -> [9, C, C] per-phase tap stack.

    Tap order (derived from the dilated form's pad (1, 2) and kernel
    flip, models/layers.TorchConvTranspose):

      y[2m,   2n  ] = x[m, n]   @ k[1,1]
      y[2m,   2n+1] = x[m, n]   @ k[1,2] + x[m, n+1]   @ k[1,0]
      y[2m+1, 2n  ] = x[m, n]   @ k[2,1] + x[m+1, n]   @ k[0,1]
      y[2m+1, 2n+1] = x[m, n]   @ k[2,2] + x[m, n+1]   @ k[2,0]
                    + x[m+1, n] @ k[0,2] + x[m+1, n+1] @ k[0,0]

    stacked as [ee, eo0, eo1, oe0, oe1, oo0, oo1, oo2, oo3] where the
    suffix is the shifted-view index (0: x, 1: x col+1, ... matching
    the kernel's A-operand order).
    """
    taps = [
        qk[1, 1],                          # ee
        qk[1, 2], qk[1, 0],                # eo: x, x_col+1
        qk[2, 1], qk[0, 1],                # oe: x, x_row+1
        qk[2, 2], qk[2, 0], qk[0, 2], qk[0, 0],  # oo: x, xs, xd, xds
    ]
    return jnp.stack(taps, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("act", "rows_per_block", "interpret", "out_dtype"),
)
def transpose_conv2x_int8_pallas(
    x_q: jnp.ndarray,          # [B, H, W, C] int8
    taps: jnp.ndarray,         # [9, C, C] int8 (phase_tap_matrices)
    deq: jnp.ndarray,          # [C] f32 accumulator dequant (w_scale[*s_in])
    bias: jnp.ndarray,         # [C] f32 (bias [+ corrections], pre-act)
    out_scale: jnp.ndarray,    # [C] f32 requant scale (next conv's input)
    *,
    act: str = "leaky",
    rows_per_block: int | None = None,
    interpret: bool = False,
    out_dtype=jnp.int8,
) -> jnp.ndarray:
    """[B, H, W, C] int8 -> [B, 2H, 2W, C] int8 (k3 s2 p1 op1
    transpose, fused dequant + bias + act + requant epilogue).

    ``out_dtype=jnp.int8`` emits ``_quant(y, out_scale)``;
    ``out_dtype=jnp.bfloat16``/``float32`` skips requantization and
    emits the activated float map (``out_scale`` ignored).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x_q.shape
    assert x_q.dtype == jnp.int8 and taps.shape == (9, c, c)

    if rows_per_block is None:
        # Largest divisor of H keeping the GEMM M (= R*W) near ~1k rows
        # and the per-program VMEM footprint under ~8 MB.
        rows_per_block = 1
        for r in range(1, h + 1):
            if h % r == 0 and r * w <= 1024:
                rows_per_block = r
    r = rows_per_block
    assert h % r == 0, (h, r)
    rw = r * w

    deq = jnp.broadcast_to(
        jnp.asarray(deq, jnp.float32).reshape(-1), (c,)
    ).reshape(1, c)
    bias = jnp.broadcast_to(
        jnp.asarray(bias, jnp.float32).reshape(-1), (c,)
    ).reshape(1, c)
    out_scale = jnp.broadcast_to(
        jnp.asarray(out_scale, jnp.float32).reshape(-1), (c,)
    ).reshape(1, c)

    n_row_blocks = h // r

    def kernel_fn(xr, hr, tr, dr, br, sr, outr):
        m = pl.program_id(1)
        x = xr[0]                                     # [R, W, C] int8
        # Halo row (the strip below's first row); zero at the bottom
        # edge where the clamped block spec re-reads an interior row.
        halo = jnp.where(
            (m + 1) * r < h, hr[0, 0], jnp.zeros_like(hr[0, 0])
        )                                             # [W, C] int8
        zc = jnp.zeros((r, 1, c), jnp.int8)
        xs = jnp.concatenate([x[:, 1:], zc], axis=1)          # col+1
        xd = jnp.concatenate([x[1:], halo[None]], axis=0)     # row+1
        xds = jnp.concatenate([xd[:, 1:], zc], axis=1)        # both

        a = x.reshape(rw, c)
        a_s = xs.reshape(rw, c)
        a_d = xd.reshape(rw, c)
        a_ds = xds.reshape(rw, c)

        def mm(av, t_idx):
            return jax.lax.dot_general(
                av, tr[t_idx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        ee = mm(a, 0)
        eo = mm(a, 1) + mm(a_s, 2)
        oe = mm(a, 3) + mm(a_d, 4)
        oo = mm(a, 5) + mm(a_s, 6) + mm(a_d, 7) + mm(a_ds, 8)

        def epi(acc):
            y = acc.astype(jnp.float32) * dr[:] + br[:]
            if act == "leaky":
                y = jnp.where(y >= 0, y, 0.01 * y)
            elif act == "relu":
                y = jnp.maximum(y, 0.0)
            if out_dtype == jnp.int8:
                return jnp.clip(
                    jnp.round(y / sr[:]), -127, 127
                ).astype(jnp.int8)
            return y.astype(out_dtype)

        ee, eo, oe, oo = epi(ee), epi(eo), epi(oe), epi(oo)

        # Interleave: columns within a row ([RW, 2, C] -> rows of 2W),
        # then even/odd rows ([R, 2, 2W, C] -> 2R rows).  All reshapes
        # are memory-order preserving (channels stay in lanes).
        even = jnp.stack([ee, eo], axis=1).reshape(r, 2 * w, c)
        odd = jnp.stack([oe, oo], axis=1).reshape(r, 2 * w, c)
        outr[0] = jnp.stack([even, odd], axis=1).reshape(
            2 * r, 2 * w, c
        )

    fn = pl.pallas_call(
        kernel_fn,
        grid=(b, n_row_blocks),
        in_specs=[
            pl.BlockSpec((1, r, w, c), lambda i, j: (i, j, 0, 0)),
            # Halo: the first row of the strip below, clamped at the
            # bottom (the kernel zeroes it there).
            pl.BlockSpec(
                (1, 1, w, c),
                lambda i, j: (i, jnp.minimum((j + 1) * r, h - 1), 0, 0),
            ),
            pl.BlockSpec((9, c, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * r, 2 * w, c), lambda i, j: (i, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * w * c * c,
            bytes_accessed=(
                b * h * w * c                 # x int8
                + 9 * c * c                   # taps
                + b * 4 * h * w * c * np.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    return fn(x_q, x_q, taps, deq, bias, out_scale)


def transpose_conv2x_int8_phase_xla(
    x_q: jnp.ndarray, qk: jnp.ndarray, deq, bias, out_scale,
    *, act: str = "leaky", out_dtype=jnp.int8,
) -> jnp.ndarray:
    """Exact-tap phase decomposition in pure XLA: FOUR int8 convs (one
    per output phase — 1x1 / 1x2 / 2x1 / 2x2 taps, 9 taps total = the
    3x3 kernel), each with the dequant+bias+act+requant epilogue fused
    by XLA into its output, then ONE interleave on the final (int8 or
    bf16) phase maps.

    This is the round-3 "exact-tap phase convs" formulation with its
    two killers removed: the epilogue runs PER PHASE (so the interleave
    moves 4 int8/bf16 maps, not 4 int32 accumulators — 4-16x less
    relayout traffic), and there is no concat-then-depth-to-space: the
    stack+reshape interleave keeps channels in the lane dim throughout
    (the memory-order trick from the Pallas kernel's write path).

    Bit-equal to ``transpose_conv2x_int8_xla`` (same integer taps, same
    int32 accumulation, same f32 epilogue ops in the same order).
    MACs are the exact 9 taps — none of the merged-phase form's 16/9
    structural zeros.  Unlike the Pallas kernel, the GEMM core is XLA's
    own int8 conv (393 TOP/s measured), so this path doesn't depend on
    Mosaic's int8 dot rate.
    """
    b, h, w, c = x_q.shape
    assert x_q.dtype == jnp.int8 and qk.shape[:2] == (3, 3)
    deq = jnp.asarray(deq, jnp.float32).reshape(-1)
    bias = jnp.asarray(bias, jnp.float32).reshape(-1)
    s_out = jnp.asarray(out_scale, jnp.float32).reshape(-1)

    def conv(kern, pad):
        return jax.lax.conv_general_dilated(
            x_q, kern, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def epi(acc):
        y = acc.astype(jnp.float32) * deq + bias
        if act == "leaky":
            y = jnp.where(y >= 0, y, 0.01 * y)
        elif act == "relu":
            y = jnp.maximum(y, 0.0)
        if out_dtype == jnp.int8:
            return jnp.clip(
                jnp.round(y / s_out), -127, 127
            ).astype(jnp.int8)
        return y.astype(out_dtype)

    # Tap placement per phase (ops docstring at phase_tap_matrices):
    #   y[2m,   2n  ] = x[m, n] @ k[1,1]
    #   y[2m,   2n+1] = x[m, n] @ k[1,2] + x[m, n+1] @ k[1,0]
    #   y[2m+1, 2n  ] = x[m, n] @ k[2,1] + x[m+1, n] @ k[0,1]
    #   y[2m+1, 2n+1] = x @ k[2,2] + x_c @ k[2,0] + x_r @ k[0,2]
    #                 + x_rc @ k[0,0]
    # Each phase is a conv whose kernel spans the (row, col) shifts it
    # reads, padded (0, 1) on the shifted axes (x[·, W] = 0).
    k = qk
    ee = epi(conv(k[1:2, 1:2], ((0, 0), (0, 0))))
    eo = epi(conv(
        jnp.stack([k[1, 2], k[1, 0]], axis=0)[None], ((0, 0), (0, 1))
    ))
    oe = epi(conv(
        jnp.stack([k[2, 1], k[0, 1]], axis=0)[:, None], ((0, 1), (0, 0))
    ))
    oo = epi(conv(
        jnp.stack([
            jnp.stack([k[2, 2], k[2, 0]], axis=0),
            jnp.stack([k[0, 2], k[0, 0]], axis=0),
        ], axis=0), ((0, 1), (0, 1)),
    ))

    even = jnp.stack([ee, eo], axis=3).reshape(b, h, 2 * w, c)
    odd = jnp.stack([oe, oo], axis=3).reshape(b, h, 2 * w, c)
    return jnp.stack([even, odd], axis=2).reshape(b, 2 * h, 2 * w, c)


def transpose_conv2x_int8_xla(
    x_q: jnp.ndarray, qk: jnp.ndarray, deq, bias, out_scale,
    *, act: str = "leaky", out_dtype=jnp.int8,
) -> jnp.ndarray:
    """XLA int8-sim reference: lhs-dilated int8 conv (integer
    accumulation — bit-identical to the phase GEMMs) + the same
    epilogue.  Slow on chip (XLA pays the dilation zeros in int8);
    exists as the kernel's equivalence oracle and the CPU test path."""
    flipped = jnp.flip(qk, axis=(0, 1))
    acc = jax.lax.conv_general_dilated(
        x_q, flipped, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * jnp.asarray(deq, jnp.float32) \
        + jnp.asarray(bias, jnp.float32)
    if act == "leaky":
        y = jnp.where(y >= 0, y, 0.01 * y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    if out_dtype == jnp.int8:
        s = jnp.asarray(out_scale, jnp.float32)
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)
