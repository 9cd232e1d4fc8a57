"""Visualization utilities.

Parity target: ``utils/plot.py`` — prototype grids, predicted-vs-truth
box plots, mask overlays, and the cv2 overlay renderer the serving nodes
publish as debug imagery.  numpy/matplotlib/cv2 only (host side).
"""

from __future__ import annotations

import pathlib
from math import ceil, sqrt
from typing import Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import cv2  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def save_plot(fig: plt.Figure, save_dir: Optional[pathlib.Path], name: str):
    if save_dir is not None:
        save_dir = pathlib.Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_dir / name)
    plt.close(fig)


def plot_prototype(prototype: np.ndarray) -> plt.Figure:
    """Grid of prototype masks; prototype is [P, h, w] (plot.py:24-38)."""
    from mpl_toolkits.axes_grid1 import ImageGrid

    prototype = np.asarray(prototype)
    fig = plt.figure()
    depth = prototype.shape[0]
    nrows = int(ceil(sqrt(depth)))
    grid = ImageGrid(
        fig, 111, nrows_ncols=(nrows, nrows), share_all=True,
        cbar_mode="single", axes_pad=0.2, cbar_pad=0.5,
    )
    img = None
    for i in range(depth):
        img = grid[i].imshow(prototype[i])
    if img is not None:
        grid.cbar_axes[0].colorbar(img)
    return fig


def _box_corners_px(box: np.ndarray, img_hw) -> np.ndarray:
    h, w = img_hw
    return np.stack(
        [
            (box[:, 0] - box[:, 2] / 2) * h,
            (box[:, 1] - box[:, 3] / 2) * w,
            (box[:, 0] + box[:, 2] / 2) * h,
            (box[:, 1] + box[:, 3] / 2) * w,
        ],
        axis=-1,
    )


def plot_detection(
    img: np.ndarray,
    classification: np.ndarray,
    box: np.ndarray,
    truth_valid: Optional[np.ndarray] = None,
    truth_classification: Optional[np.ndarray] = None,
    truth_box: Optional[np.ndarray] = None,
) -> plt.Figure:
    """Predicted (solid) vs truth (dashed) boxes (plot.py:41-81).
    img is [H, W, 3]; boxes are normalized (y, x, h, w)."""
    img = np.asarray(img)
    fig = plt.figure()
    plt.imshow(img)
    cmap = matplotlib.colormaps.get_cmap("tab10")

    corners = _box_corners_px(np.asarray(box), img.shape[:2])
    for i in range(len(corners)):
        y0, x0, y1, x1 = corners[i]
        plt.gca().add_patch(
            plt.Rectangle(
                (x0, y0), x1 - x0, y1 - y0, linewidth=1, linestyle="solid",
                edgecolor=cmap(int(classification[i])), facecolor="none",
            )
        )

    if truth_box is not None:
        truth_corners = _box_corners_px(np.asarray(truth_box), img.shape[:2])
        for i in range(len(truth_corners)):
            if truth_valid is not None and not truth_valid[i]:
                continue
            y0, x0, y1, x1 = truth_corners[i]
            plt.gca().add_patch(
                plt.Rectangle(
                    (x0, y0), x1 - x0, y1 - y0, linewidth=1,
                    linestyle="dashed",
                    edgecolor=cmap(int(truth_classification[i])),
                    facecolor="none",
                )
            )
    return fig


def plot_mask(
    img: Optional[np.ndarray], masks: np.ndarray, alpha: float = 0.5
) -> plt.Figure:
    """Mask-over-image grid (plot.py:84-111); masks [K, h, w]."""
    from mpl_toolkits.axes_grid1 import ImageGrid

    masks = np.asarray(masks)
    fig = plt.figure()
    depth = masks.shape[0]
    nrows = int(ceil(sqrt(depth)))
    grid = ImageGrid(
        fig, 111, nrows_ncols=(nrows, nrows), share_all=True,
        cbar_mode="single", axes_pad=0.2, cbar_pad=0.5,
    )
    im = None
    for i in range(depth):
        if img is not None:
            h, w = masks.shape[1:]
            base = cv2.resize(np.asarray(img), (w, h)).astype(np.float32)
            if base.max() > 1:
                base = base / 255.0
            overlay = (1 - alpha) * base + alpha * masks[i][..., None]
            im = grid[i].imshow(np.clip(overlay, 0, 1))
        else:
            im = grid[i].imshow(masks[i])
    if im is not None:
        grid.cbar_axes[0].colorbar(im)
    return fig


def plot_heatmap(heatmap: np.ndarray) -> plt.Figure:
    """Per-class heatmap grid (centernet/scripts/train.py:93-101 figure)."""
    from mpl_toolkits.axes_grid1 import ImageGrid

    heatmap = np.asarray(heatmap)
    fig = plt.figure()
    depth = heatmap.shape[0]
    nrows = int(ceil(sqrt(depth)))
    grid = ImageGrid(
        fig, 111, nrows_ncols=(nrows, max(nrows, 1)), share_all=True,
        cbar_mode="single", axes_pad=0.2, cbar_pad=0.5,
    )
    im = None
    for i in range(depth):
        im = grid[i].imshow(heatmap[i], vmin=0, vmax=1)
    if im is not None:
        grid.cbar_axes[0].colorbar(im)
    return fig


def plot_prediction_np(
    img_np: np.ndarray,
    class_id_np: np.ndarray,
    confidence_np: np.ndarray,
    box_np: np.ndarray,
    mask_np: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """cv2 overlay used by the serving debug topic (plot.py:113-154).

    img_np: [H, W, 3] uint8; boxes normalized (y, x, h, w);
    confidence_np: [K] scores; mask_np: optional [K, H, W] bool.
    """
    vis = np.ascontiguousarray(np.asarray(img_np).copy())
    cmap = matplotlib.colormaps.get_cmap("tab10")
    h, w = vis.shape[:2]

    for i in range(len(class_id_np)):
        color = cmap(int(class_id_np[i]) % 10)
        color = tuple(int(255 * c) for c in color[:3])

        x0y0 = (
            int(w * (box_np[i, 1] - box_np[i, 3] / 2)),
            int(h * (box_np[i, 0] - box_np[i, 2] / 2)),
        )
        x1y1 = (
            int(w * (box_np[i, 1] + box_np[i, 3] / 2)),
            int(h * (box_np[i, 0] + box_np[i, 2] / 2)),
        )
        vis = cv2.rectangle(vis, x0y0, x1y1, color, 2)

        label = f"{float(confidence_np[i]):.2f}"
        if class_names is not None:
            label = f"{class_names[int(class_id_np[i])]} {label}"
        text_pos = (
            (x0y0[0], x0y0[1] - 10) if x0y0[1] > 20 else (x0y0[0], x1y1[1] + 30)
        )
        vis = cv2.putText(
            vis, label, text_pos, cv2.FONT_HERSHEY_SIMPLEX, 0.9, color, 2
        )

        if mask_np is not None:
            alpha = 0.5
            region = mask_np[i].astype(bool)
            vis[region] = (
                alpha * np.array(color) + (1 - alpha) * vis[region]
            ).astype(vis.dtype)

    return vis


def draw_frame_axes(
    img: np.ndarray,
    rotation: np.ndarray,
    translation: np.ndarray,
    intrinsics: np.ndarray,
    length: float = 0.1,
    thickness: int = 3,
) -> np.ndarray:
    """Draw a PnP pose as RGB axes on the image
    (evaluate_keypoints.py:126-137's cv2.drawFrameAxes usage).

    rotation: [3, 3]; translation: [3]; intrinsics: [3, 3].
    """
    rvec, _ = cv2.Rodrigues(np.asarray(rotation, np.float64))
    return cv2.drawFrameAxes(
        np.ascontiguousarray(img).copy(),
        np.asarray(intrinsics, np.float64)[:, :3],
        np.zeros(4),
        rvec,
        np.asarray(translation, np.float64).reshape(3, 1),
        length,
        thickness,
    )
