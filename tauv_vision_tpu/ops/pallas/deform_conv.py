"""Pallas TPU kernel for modulated deformable conv v2 (DCNv2).

Replaces the XLA shift-window formulation (ops/deform_conv.py
``deform_conv2d_shift``) on the serving path.  Same math — bilinear
sampling expressed as a sum over static integer shifts weighted by
per-pixel hat functions, exact for |offset| <= max_offset — but the
shifted reads become VMEM slices instead of XLA pad/slice ops, which is
the whole game: measured on-chip, XLA materializes the shifted
intermediates to HBM (the ``--deform`` bench ran at 40 fps, consistent
with ~1 TB/batch of traffic), while this kernel streams each column
block through VMEM once and is VPU-compute-bound.

Layout (measured, v5e): the grid tiles the image over COLUMN blocks, so
in-kernel arrays are [H + 2*halo, wb + 2*halo, C] with the narrow column
extent in the sublane dimension.  Row shifts then slice the untiled
major dimension (free) and column shifts rotate only ~3-4 sublane tiles.
The first version blocked over rows with the full W in sublanes; its x
shifts rotated ~22 tiles per read and ran 10x below the VPU bound.

Per grid step (one column block of one batch element):
  1. DMA the block + halo columns/rows of the pre-padded input into
     VMEM; convert to f32 once;
  2. for each of the 9 taps: build the hat weights from the offset
     channels, accumulate the (2r+2)^2 statically-shifted FMAs into a
     sampled-map scratch ref (in-place: a pure value chain keeps every
     shifted window live and blows the scoped-VMEM cap), apply the
     modulation mask;
  3. contract sampled [H*wb, C] x weight[tap] [C, O] on the MXU into a
     float32 accumulator;
  4. + bias, cast, write the output block.

Semantics match torchvision.ops.deform_conv2d (stride 1, dilation 1,
3x3, the DLA-34 configuration, centerpoint_dla.py:360-392) whenever
every |offset| <= max_offset; larger offsets contribute zero (same
deviation as deform_conv2d_shift, tested against the gather reference).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dcn_kernel(
    x_hbm,          # [B, H + 2*halo, W_pad, C] padded input (ANY/HBM)
    offset_ref,     # [1, H, wb, 2*KK] VMEM
    mask_ref,       # [1, H, wb, KK] VMEM
    weight_ref,     # [KK, C, O] VMEM
    bias_ref,       # [1, O] VMEM
    out_ref,        # [1, H, wb, O] VMEM
    x_vmem,         # scratch [H + 2*halo, wb_halo, C]
    xrot_ref,       # scratch [S_x, H + 2*halo, wb, C] f32 pre-rotated
    sampled_ref,    # scratch [H, wb, C] f32 per-tap bilinear sample
    acc_ref,        # scratch [H * wb, O] f32
    dma_sem,
    *,
    wb: int,
    halo: int,
    kk: int,
    r: int,
    use_mask: bool,
):
    h = out_ref.shape[1]
    c = x_vmem.shape[-1]

    batch = pl.program_id(0)
    block = pl.program_id(1)

    # Columns [block*wb, block*wb + wb) of the unpadded image; the padded
    # input has `halo` extra rows/cols on every side, so the halo'd block
    # starts at padded column block*wb.  (The full padded array stays in
    # HBM — Mosaic requires ANY-space operands unblocked — and each
    # program DMAs only its block.)
    copy = pltpu.make_async_copy(
        x_hbm.at[batch, :, pl.ds(block * wb, x_vmem.shape[1]), :],
        x_vmem,
        dma_sem,
    )
    copy.start()

    offset = offset_ref[0]            # [H, wb, 2*KK] f32
    if use_mask:
        mask = mask_ref[0]            # [H, wb, KK]

    copy.wait()

    k = int(np.sqrt(kk))
    pad = k // 2

    # Pre-rotate once per program: copy the block at every column shift
    # the taps will read (sx in [-pad - r, pad + r + 1]), converting to
    # f32 in the same pass.  Column shifts rotate the sublane dim — the
    # expensive move on TPU — so doing each distinct rotation once, here,
    # leaves the hot loop below with only free major-dim row slices.
    # (Per-shift rotations in the loop ran 5-10x below the VPU bound.)
    sx_lo = -pad - r
    n_sx = 2 * (pad + r) + 2
    for j in range(n_sx):
        sx = sx_lo + j
        xrot_ref[j] = x_vmem[:, halo + sx:halo + sx + wb, :].astype(
            jnp.float32
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)

    for tap in range(kk):
        ky, kx = tap // k, tap % k
        base_y = ky - pad
        base_x = kx - pad
        # Sample position relative to the output pixel: tap base + offset.
        dy = offset[:, :, 2 * tap] + base_y       # [H, wb]
        dx = offset[:, :, 2 * tap + 1] + base_x

        # hat weights for this tap's 2r+2 column shifts (shared by every
        # row shift), materialized broadcast over the lane (channel) dim
        # once per tap: the [H, wb] weight planes live with wb in lanes,
        # so a per-FMA implicit broadcast would relayout every time.
        wxs = [
            jnp.broadcast_to(
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(dx - (base_x - r + jj))
                )[:, :, None],
                (h, wb, c),
            )
            for jj in range(2 * r + 2)
        ]

        sampled_ref[:] = jnp.zeros((h, wb, c), jnp.float32)

        # fori_loop over the row shifts (dynamic starts on the untiled
        # major dim are cheap); the column shifts stay unrolled but read
        # the pre-rotated copies — no data movement inside the loop.
        def row_shift(i, _):
            sy = base_y - r + i                            # traced scalar
            wy = jnp.broadcast_to(
                jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))[:, :, None],
                (h, wb, c),
            )
            row = pl.ds(halo + sy, h)
            tmp = None
            for jj in range(2 * r + 2):
                j = (base_x - r) - sx_lo + jj
                term = wxs[jj] * xrot_ref[j, row, :, :]
                tmp = term if tmp is None else tmp + term
            sampled_ref[:] += wy * tmp
            return 0

        jax.lax.fori_loop(0, 2 * r + 2, row_shift, 0)

        sampled = sampled_ref[:]
        if use_mask:
            sampled = sampled * mask[:, :, tap][:, :, None]

        acc_ref[:] += jax.lax.dot_general(
            sampled.reshape(h * wb, c).astype(weight_ref.dtype),
            weight_ref[tap],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = acc_ref[:] + bias_ref[0][None, :]
    out_ref[0] = out.reshape(h, wb, -1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("padding", "max_offset", "cols_per_block", "interpret"),
)
def deform_conv2d_pallas(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    padding: int = 1,
    max_offset: int = 3,
    cols_per_block: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``deform_conv2d_shift`` (stride 1, dilation 1).

    Args:
      x: [B, H, W, C]; offset: [B, H, W, 2*K*K] (y, x) pairs, taps
      row-major; mask: optional [B, H, W, K*K] (sigmoided); weight:
      [Kh, Kw, C, O]; bias: [O].
    Returns [B, H, W, O] in x.dtype.
    """
    b, h, w, c = x.shape
    kh, kw, _, out_c = weight.shape
    assert kh == kw and padding == kh // 2, "stem configuration only"
    kk = kh * kw
    r = max_offset
    halo = padding + r + 1

    wb = min(cols_per_block, w)
    n_blocks = -(-w // wb)
    w_pad = n_blocks * wb
    # Mosaic DMA slices must be tile-aligned: sublane dim (the halo'd
    # block width) to 8, lane dim (channels) to 128.  Extra right
    # columns are never read (every kernel slice stays within
    # halo + wb + halo); extra channels multiply zero weight rows.  VMEM
    # lanes pad to 128 regardless, so the channel padding costs only DMA
    # bytes.
    wb_halo = wb + 2 * halo
    wb_halo += (-wb_halo) % 8
    c_pad = -(-c // 128) * 128

    # Pad: halo on all sides, plus right fill so column blocks tile
    # evenly and the last block's DMA slice stays in bounds.
    x_padded = jnp.pad(
        x,
        ((0, 0), (halo, halo),
         (halo, (w_pad - w) + (wb_halo - wb - halo)),
         (0, c_pad - c)),
    )
    pad_cols = w_pad - w
    if pad_cols:
        offset = jnp.pad(offset, ((0, 0), (0, 0), (0, pad_cols), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_cols), (0, 0)))

    use_mask = mask is not None
    if mask is None:
        mask = jnp.ones((b, h, w_pad, kk), x.dtype)
    if bias is None:
        bias = jnp.zeros((out_c,), jnp.float32)

    weight_flat = jnp.pad(
        weight.reshape(kk, c, out_c), ((0, 0), (0, c_pad - c), (0, 0))
    ).astype(x.dtype)

    kernel = functools.partial(
        _dcn_kernel, wb=wb, halo=halo, kk=kk, r=r, use_mask=use_mask
    )

    out = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, h, wb, 2 * kk),
                lambda bi, wi: (bi, 0, wi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h, wb, kk),
                lambda bi, wi: (bi, 0, wi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # weight
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias [1, O]
        ],
        out_specs=pl.BlockSpec(
            (1, h, wb, out_c),
            lambda bi, wi: (bi, 0, wi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w_pad, out_c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * halo, wb_halo, c_pad), x.dtype),
            pltpu.VMEM(
                (2 * (kh // 2 + r) + 2, h + 2 * halo, wb, c_pad),
                jnp.float32,
            ),
            pltpu.VMEM((h, wb, c_pad), jnp.float32),
            pltpu.VMEM((h * wb, out_c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        # Mosaic's default 16 MB scoped-VMEM cap is exceeded by the
        # unrolled shifted-window temporaries at 512 channels; v5e has
        # 128 MB VMEM, so raise the cap rather than shrink the blocks.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x_padded,
        offset.astype(jnp.float32),
        mask.astype(x.dtype),
        weight_flat,
        bias.astype(jnp.float32).reshape(1, out_c),
    )
    return out[:, :, :w]
