"""Pallas TPU kernel for the bilinear depthwise upsample.

The CN aggregation stage (models/centerpoint_dla.DLAUp/IDAUp, reference
centerpoint_dla.py:411-462) runs five trainable bilinear depthwise
transposed convs (kernel 2f, stride f, groups C — ``fill_up_weights``
init, centerpoint_dla.py:334).  Serving lowers them as dilated
depthwise correlations, which pay k^2 = 4f^2 VPU taps per output
element where only 2x2 are nonzero on the undilated grid; the zero-free
phase forms fix that standalone but lose whole-model because their
XLA depth-to-space forces a layout change on the surrounding graph
(BENCH.md "measured dead ends", rounds 2-3: channel-major phase -15%
in context, block-phase 0.31x standalone at batch 128).

This kernel does the zero-free math INSIDE one Pallas program and
emits a standard NHWC result, so XLA sees conv-in/conv-out with no
layout degrees of freedom:

  - every output phase (a, b) of a k=2f s=f transpose has exactly 2x2
    taps (``_phase_taps``), so per phase the compute is four
    lane-aligned FMAs of statically-shifted input slices;
  - phases interleave in VMEM via stack+reshape on the sublane/major
    dims (channels stay the lane dim throughout — no lane shuffles,
    which Mosaic runs 5x slower, scripts/mosaic_op_probe.py);
  - grid is (batch,): one image per program; the largest instance
    ([45, 80, 64] -> [90, 160, 64] bf16) is ~2.6 MB of VMEM.

Exactness: same tap weights, same adds, f32 accumulation per output
element (four FMAs), cast to the input dtype at the end — matches the
dilated lowering to bf16 ulp (the dilated form accumulates the k^2
window in f32 including its zeros).  Gated by an equivalence test
(tests/test_pallas_depthwise_upsample.py) and served behind
``DepthwiseUpsample(impl="pallas")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.ops.conv_transpose import _phase_taps


def _phase_weights(kernel: jnp.ndarray, factor: int):
    """Per-phase 2x2 tap weights from the [k, k, 1, C] HWIO kernel.

    Returns (weights, dy0, dx0) where weights[a][b] is a list of
    (dy, dx, w[C]) with dy/dx in {0, 1, 2} relative to the phase's
    minimum input offset, plus each phase's base offsets.
    """
    k = kernel.shape[0]
    f = factor
    # _phase_taps wants pad_lo = k - 1 - p_torch, which IS the dilated
    # lowering's spatial padding (p_torch = f // 2).
    pad_lo = k - 1 - f // 2
    flipped = jnp.flip(kernel, axis=(0, 1))[:, :, 0, :]  # [k, k, C]
    phases = []
    for a in range(f):
        kys, dys = _phase_taps(k, f, pad_lo, a)
        row = []
        for b in range(f):
            kxs, dxs = _phase_taps(k, f, pad_lo, b)
            taps = []
            for ky, dy in zip(kys, dys):
                for kx, dx in zip(kxs, dxs):
                    taps.append((dy, dx, flipped[ky, kx]))
            row.append(taps)
        phases.append(row)
    d_min = min(
        min(d for d, _, _ in taps) for row in phases for taps in row
    )
    d_max = max(
        max(max(dy, dx) for dy, dx, _ in taps)
        for row in phases for taps in row
    )
    return phases, d_min, d_max


def depthwise_upsample_pallas(
    x: jnp.ndarray, kernel: jnp.ndarray, factor: int, *,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, H, W, C] -> [B, f*H, f*W, C], torch ConvTranspose2d(
    kernel=2f, stride=f, padding=f//2, groups=C, bias=False) semantics
    — the DepthwiseUpsample module's dilated lowering, zero-free."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    f = factor
    assert kernel.shape[0] == 2 * f and kernel.shape[2] == 1

    phases, d_min, d_max = _phase_weights(
        kernel.astype(jnp.float32), f
    )
    lo = -d_min            # leading pad rows/cols
    hi = d_max             # trailing pad rows/cols
    hp, wp = h + lo + hi, w + lo + hi

    x_pad = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))

    # Phase tap weights as one [f, f, 4, C] operand (every phase of a
    # k=2f s=f transpose has exactly 2x2 taps).  Built with jnp stacks
    # so traced kernels (the served flax param) work; the shift table
    # is static (index arithmetic only).
    dtab = np.zeros((f, f, 4, 2), np.int32)
    wrows = []
    for a in range(f):
        wcols = []
        for bb in range(f):
            taps = phases[a][bb]
            assert len(taps) == 4, (f, a, bb, len(taps))
            for t, (dy, dx, _) in enumerate(taps):
                dtab[a, bb, t] = (dy - d_min, dx - d_min)
            wcols.append(jnp.stack([wv for _, _, wv in taps], axis=0))
        wrows.append(jnp.stack(wcols, axis=0))
    wtab_j = jnp.stack(wrows, axis=0)

    # Row-chunked phase computation: the first revision built all f^2
    # full-image f32 phase maps before interleaving, which blew the
    # scoped-vmem stack (~30-43 MB at the CN aggregation shapes).
    # Chunking the H axis bounds the live set to ~f^2 * rc * fW * C f32
    # (~1-2 MB) and writes each chunk's interleaved rows straight into
    # the output ref (contiguous major-dim slice — free on TPU).
    rc = max(1, (1 << 20) // max(f * f * w * c * 4, 1))
    rc = min(rc, h)

    def kernel_fn(xr, wr, outr):
        x = xr[0]                               # [hp, wp, C] in dtype
        for y0 in range(0, h, rc):
            rows_n = min(rc, h - y0)
            xs = x[y0:y0 + rows_n + lo + hi].astype(jnp.float32)
            rows = []
            for a in range(f):
                cols = []
                for bb in range(f):
                    acc = None
                    for t in range(4):
                        dy = int(dtab[a, bb, t, 0])
                        dx = int(dtab[a, bb, t, 1])
                        term = (
                            xs[dy:dy + rows_n, dx:dx + w, :]
                            * wr[a, bb, t][None, None, :]
                        )
                        acc = term if acc is None else acc + term
                    cols.append(acc)
                # interleave along W: [rows, w, f, C] -> [rows, f*w, C]
                rows.append(
                    jnp.stack(cols, axis=2).reshape(rows_n, f * w, c)
                )
            # interleave along H: [rows, f, f*w, C] -> [f*rows, f*w, C]
            out = jnp.stack(rows, axis=1).reshape(
                f * rows_n, f * w, c
            )
            outr[0, f * y0:f * (y0 + rows_n)] = out.astype(outr.dtype)

    fn = pl.pallas_call(
        kernel_fn,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((f, f, 4, c), lambda i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f * h, f * w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, f * h, f * w, c), x.dtype),
        interpret=interpret,
    )
    return fn(x_pad, wtab_j)
