"""Fused heatmap peak decode as a Pallas TPU kernel.

The CenterNet decode front end (sigmoid -> 3x3 max-pool-equality NMS ->
flat top-k; reference decode.py:446-448, 629-669) as ONE kernel: the
heatmap tile stays in VMEM across all three stages and only the [K]
results leave, instead of XLA materializing the suppressed map in HBM
between the pooling and top-k programs.

Grid: one program per batch element.  Top-k runs as K iterative
argmax+suppress passes in VMEM — K is ~10-100 while the map is ~50k
elements, so the scan cost is negligible against the memory saved.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _peak_decode_kernel(
    heatmap_ref, score_ref, index_ref, *, n_detections: int, kernel_size: int
):
    # heatmap_ref: [1, C, H, W] logits for one sample (VMEM).
    _, c, h, w = heatmap_ref.shape
    pad = (kernel_size - 1) // 2

    prob = jax.nn.sigmoid(heatmap_ref[0])

    # 3x3 max pool via static shifts (VPU max ops, no reduce_window).
    local_max = prob
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            if dy == 0 and dx == 0:
                continue
            shifted = prob
            # shift along H
            if dy > 0:
                shifted = jnp.concatenate(
                    [shifted[:, dy:, :], jnp.full((c, dy, w), NEG)], axis=1
                )
            elif dy < 0:
                shifted = jnp.concatenate(
                    [jnp.full((c, -dy, w), NEG), shifted[:, :dy, :]], axis=1
                )
            # shift along W
            if dx > 0:
                shifted = jnp.concatenate(
                    [shifted[:, :, dx:], jnp.full((c, h, dx), NEG)], axis=2
                )
            elif dx < 0:
                shifted = jnp.concatenate(
                    [jnp.full((c, h, -dx), NEG), shifted[:, :, :dx]], axis=2
                )
            local_max = jnp.maximum(local_max, shifted)

    suppressed = jnp.where(prob >= local_max, prob, 0.0)

    # Iterative top-k over the flattened map.
    flat = suppressed.reshape(c * h, w)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (c * h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c * h, w), 1)
    flat_ids = row_ids * w + col_ids

    # Results accumulate in an [8, 128] register tile (scalar stores to
    # VMEM are unsupported); one vector store per output at the end.
    tile_rows = score_ref.shape[1]
    tile_cols = score_ref.shape[2]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_cols), 1)
    row_ids_t = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_cols), 0)

    def body(k, carry):
        flat, scores, idxs = carry
        m = jnp.max(flat)
        # First occurrence (smallest flat id among maxima).
        idx = jnp.min(jnp.where(flat == m, flat_ids, jnp.iinfo(jnp.int32).max))
        hit = (row_ids_t == 0) & (col_ids == k)
        scores = jnp.where(hit, m, scores)
        idxs = jnp.where(hit, idx, idxs)
        flat = jnp.where(flat_ids == idx, NEG, flat)
        return flat, scores, idxs

    scores0 = jnp.zeros((tile_rows, tile_cols), jnp.float32)
    idxs0 = jnp.zeros((tile_rows, tile_cols), jnp.int32)
    _, scores, idxs = jax.lax.fori_loop(
        0, n_detections, body, (flat, scores0, idxs0)
    )
    score_ref[0] = scores
    index_ref[0] = idxs


@functools.partial(jax.jit, static_argnums=(1, 2))
def peak_decode_pallas(
    heatmap_logits: jnp.ndarray, n_detections: int, kernel_size: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.peaks.peak_decode.

    heatmap_logits: [B, C, H, W].
    Returns (index [B, K, 2] int32, label [B, K] int32, score [B, K]).
    """
    b, c, h, w = heatmap_logits.shape

    kernel = functools.partial(
        _peak_decode_kernel, n_detections=n_detections, kernel_size=kernel_size
    )
    assert n_detections <= 128, "peak kernel packs results into one tile"

    score_t, idx_t = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        # Results live in one (8, 128) tile per sample to satisfy the
        # last-two-dims tiling rule; sliced back to [B, K] outside.
        out_specs=(
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.int32),
        ),
    )(heatmap_logits.astype(jnp.float32))

    score = score_t[:, 0, :n_detections]
    flat_idx = idx_t[:, 0, :n_detections]
    label = (flat_idx // (h * w)).astype(jnp.int32)
    cell = (flat_idx % (h * w)).astype(jnp.int32)
    index = jnp.stack((cell // w, cell % w), axis=-1)
    return index, label, score
