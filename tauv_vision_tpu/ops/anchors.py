"""Anchor generation for YOLACT.

Parity target: ``yolact/model/anchors.py:9-40``.  For an FPN level with
feature size (fh, fw), anchors live at cell centers ``(i + 0.5) / fh``.
For each aspect ratio ``ar`` the anchor size is
``h = scale / mean(in_h, in_w) * sqrt(ar)`` and ``w = .../ sqrt(ar)``.

Ordering divergence (deliberate bug-fix): the reference emits anchors
aspect-ratio-major (all cells for ar0, then ar1, ...; anchors.py:17-36)
while its prediction head flattens cell-major ``[B, H, W, A*(C+1)] ->
[B, H*W*A, C+1]`` (prediction_head.py:110-112) — the two orders only agree
for a single aspect ratio, which is what the production config uses
(``yolact/scripts/train.py:42``).  We emit anchors cell-major so slot i of
the prediction tensor is always paired with the anchor at the same spatial
cell, which is the evident intent and correct for any A.

TPU-first design note: anchors depend only on the (static) config, so they
are computed with numpy at setup time and baked into the jitted graph as a
constant — no per-step anchor computation, unlike the reference which
regenerates anchors on every forward pass (model.py:47-58).
"""

from __future__ import annotations

from math import sqrt
from typing import Sequence, Tuple

import numpy as np


def fpn_level_sizes(
    in_h: int, in_w: int, n_levels: int
) -> Tuple[Tuple[int, int], ...]:
    """Feature-map sizes of each FPN level.

    Backbone taps are at strides 8/16/32 (ResNet layer2/3/4); extra levels
    halve with ceil rounding (stride-2 conv with SAME-style padding 1,
    kernel 3: out = floor((in - 1) / 2) + 1 = ceil(in / 2)).
    """
    sizes = []
    for stride in (8, 16, 32):
        sizes.append((-(-in_h // stride), -(-in_w // stride)))
    h, w = sizes[-1]
    for _ in range(n_levels - 3):
        h = (h - 1) // 2 + 1
        w = (w - 1) // 2 + 1
        sizes.append((h, w))
    return tuple(sizes)


def get_anchor(
    fpn_i: int,
    fpn_size: Tuple[int, int],
    anchor_scales: Sequence[float],
    anchor_aspect_ratios: Sequence[float],
    in_h: int,
    in_w: int,
) -> np.ndarray:
    """Anchors for one FPN level; returns [fh*fw*A, 4] float32 (y, x, h, w),
    flattened cell-major (y, x, aspect-ratio) to match the prediction-head
    reshape."""
    fh, fw = fpn_size
    y = (np.arange(fh, dtype=np.float32) + 0.5) / fh
    x = (np.arange(fw, dtype=np.float32) + 0.5) / fw
    yy, xx = np.meshgrid(y, x, indexing="ij")  # [fh, fw]

    in_size = (in_h + in_w) / 2
    scale = anchor_scales[fpn_i]

    hs = np.array(
        [(scale / in_size) * sqrt(ar) for ar in anchor_aspect_ratios],
        dtype=np.float32,
    )
    ws = np.array(
        [(scale / in_size) / sqrt(ar) for ar in anchor_aspect_ratios],
        dtype=np.float32,
    )

    n_ar = len(anchor_aspect_ratios)
    yy = np.broadcast_to(yy[:, :, None], (fh, fw, n_ar))
    xx = np.broadcast_to(xx[:, :, None], (fh, fw, n_ar))
    hh = np.broadcast_to(hs[None, None, :], (fh, fw, n_ar))
    ww = np.broadcast_to(ws[None, None, :], (fh, fw, n_ar))

    anchor = np.stack((yy, xx, hh, ww), axis=-1).reshape(-1, 4)
    return anchor.astype(np.float32)


def get_all_anchors(
    in_h: int,
    in_w: int,
    n_fpn_levels: int,
    anchor_scales: Sequence[float],
    anchor_aspect_ratios: Sequence[float],
) -> np.ndarray:
    """All levels concatenated: [sum_l fh_l*fw_l*A, 4] float32."""
    sizes = fpn_level_sizes(in_h, in_w, n_fpn_levels)
    return np.concatenate(
        [
            get_anchor(i, sizes[i], anchor_scales, anchor_aspect_ratios, in_h, in_w)
            for i in range(n_fpn_levels)
        ],
        axis=0,
    )
