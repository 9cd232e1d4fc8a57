"""CenterNet loss, fully vectorized and jit-safe.

Parity target: ``centernet/model/loss.py:178-299`` with the reference's
per-object Python loops replaced by padded/masked tensor ops:

- target heatmaps/affinity fields render inside the jitted step
  (ops/heatmap.py);
- per-object predictions at center cells are one gather
  (ops/heatmap.gather_at_cells) instead of a B*N Python loop;
- the ``n_valid = min(.., 1)`` normalization bug (loss.py:231) is rebuilt
  as the evident intent ``max(.., 1)``;
- per-class angle modulos become static lookup tables; classes with
  ``modulo=None`` fall back to 2*pi instead of the reference's NaN-able
  ``truth % 0``.
"""

from __future__ import annotations

from math import pi
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.configs.centernet import (
    CenternetModelConfig,
    CenternetTrainConfig,
    ObjectConfigSet,
)
from tauv_vision_tpu.models.centernet import Prediction
from tauv_vision_tpu.ops.angles import angle_loss
from tauv_vision_tpu.ops.depth import depth_loss
from tauv_vision_tpu.ops.heatmap import (
    gather_at_cells,
    generate_heatmap,
    generate_keypoint_heatmap,
    out_index_for_position,
)
from tauv_vision_tpu.ops.losses import focal_loss


@flax.struct.dataclass
class CenternetTruth:
    """Padded, static-shape truth batch (the jax analog of PoseSample,
    datasets/load/pose_dataset.py:24-354)."""

    valid: jnp.ndarray                 # [B, N] bool
    label: jnp.ndarray                 # [B, N] int32
    center: jnp.ndarray                # [B, N, 2] normalized (y, x)
    size: jnp.ndarray                  # [B, N, 2] normalized (h, w)

    roll: Optional[jnp.ndarray] = None   # [B, N]
    pitch: Optional[jnp.ndarray] = None  # [B, N]
    yaw: Optional[jnp.ndarray] = None    # [B, N]
    depth: Optional[jnp.ndarray] = None  # [B, N]

    keypoint_valid: Optional[jnp.ndarray] = None         # [B, K] bool
    keypoint_label: Optional[jnp.ndarray] = None         # [B, K] int32
    keypoint_center: Optional[jnp.ndarray] = None        # [B, K, 2]
    keypoint_object_index: Optional[jnp.ndarray] = None  # [B, K] int32


@flax.struct.dataclass
class CenternetLosses:
    total: jnp.ndarray
    heatmap: jnp.ndarray
    keypoint_heatmap: jnp.ndarray
    keypoint_affinity: jnp.ndarray
    offset: jnp.ndarray
    size: jnp.ndarray
    roll: jnp.ndarray
    pitch: jnp.ndarray
    yaw: jnp.ndarray
    depth: jnp.ndarray
    avg_size_error: jnp.ndarray
    max_size_error: jnp.ndarray
    # DCN offset-range penalty (0 when disabled or deform=False); added
    # by the train step, which has access to the sown offsets.
    dcn_offset: jnp.ndarray = 0.0


def _modulo_table(object_config: ObjectConfigSet, which: str) -> np.ndarray:
    """Per-label angle modulo; 0.0 encodes 'no modulo configured'
    (reference angle_range, loss.py:151-175)."""
    values = []
    for cfg in object_config.configs:
        modulo = getattr(cfg, which).modulo
        values.append(0.0 if modulo is None else float(modulo))
    return np.asarray(values, dtype=np.float32)


def centernet_loss(
    prediction: Prediction,
    truth: CenternetTruth,
    model_config: CenternetModelConfig,
    train_config: CenternetTrainConfig,
    object_config: ObjectConfigSet,
) -> CenternetLosses:
    mc, tc, oc = model_config, train_config, object_config

    valid_f = truth.valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)

    heatmap_target = generate_heatmap(
        truth.center, truth.label, truth.valid,
        n_labels=oc.n_labels, in_h=mc.in_h, in_w=mc.in_w,
        downsample_ratio=mc.downsample_ratio,
        sigma=tc.keypoint_heatmap_sigma,
    )

    l_heatmap = focal_loss(
        jax.nn.sigmoid(prediction.heatmap_nchw()), heatmap_target,
        alpha=tc.heatmap_focal_loss_a, beta=tc.heatmap_focal_loss_b,
    ).sum()
    total = l_heatmap

    l_keypoint_heatmap = jnp.zeros(())
    l_keypoint_affinity = jnp.zeros(())
    if prediction.keypoint_heatmap is not None:
        kp_heatmap_target, kp_aff_weight, kp_aff_target = generate_keypoint_heatmap(
            truth.keypoint_center, truth.keypoint_label, truth.keypoint_valid,
            truth.keypoint_object_index, truth.center,
            n_keypoints=oc.n_keypoints, in_h=mc.in_h, in_w=mc.in_w,
            downsample_ratio=mc.downsample_ratio,
            heatmap_sigma=tc.keypoint_heatmap_sigma,
            affinity_sigma=tc.keypoint_affinity_sigma,
        )
        l_keypoint_heatmap = tc.loss_lambda_keypoint_heatmap * focal_loss(
            jax.nn.sigmoid(prediction.keypoint_heatmap_nchw()), kp_heatmap_target,
            alpha=tc.heatmap_focal_loss_a, beta=tc.heatmap_focal_loss_b,
        ).sum()
        total = total + l_keypoint_heatmap

        # prediction affinity [B, H, W, K, 2] -> [B, K, 2, H, W]
        aff_pred = jnp.transpose(prediction.keypoint_affinity, (0, 3, 4, 1, 2))
        mse = (aff_pred - kp_aff_target) ** 2
        l_keypoint_affinity = tc.loss_lambda_keypoint_affinity * (
            kp_aff_weight[:, :, None] * mse
        ).sum()
        total = total + l_keypoint_affinity

    out_index = out_index_for_position(
        truth.center, mc.in_h, mc.in_w, mc.downsample_ratio
    )

    pred_size = gather_at_cells(prediction.size, out_index)      # [B, N, 2]
    pred_offset = gather_at_cells(prediction.offset, out_index)  # [B, N, 2]

    l_size = jnp.abs(pred_size - truth.size)
    l_size = tc.loss_lambda_size * (valid_f[..., None] * l_size).sum() / n_valid
    total = total + l_size

    size_error = jnp.abs(pred_size - truth.size)
    masked_err = jnp.where(truth.valid[..., None], size_error, jnp.nan)
    avg_size_error = jnp.nanmean(masked_err)
    max_size_error = jnp.where(truth.valid[..., None], size_error, 0.0).max()

    scale = jnp.asarray([mc.in_h, mc.in_w], dtype=jnp.float32)
    px_center = truth.center * scale
    px_offset = px_center - mc.downsample_ratio * (
        px_center / mc.downsample_ratio
    ).astype(jnp.int32)
    l_offset = jnp.abs(pred_offset - px_offset)
    l_offset = tc.loss_lambda_offset * (valid_f[..., None] * l_offset).sum() / n_valid
    total = total + l_offset

    def angle_term(bin_head, offset_head, truth_angle, which):
        table = jnp.asarray(_modulo_table(oc, which))
        theta_range = jnp.take(table, truth.label, axis=0)
        theta_range = jnp.where(theta_range > 0, theta_range, 2 * pi)
        pred_bin = gather_at_cells(bin_head, out_index)
        pred_off = gather_at_cells(offset_head, out_index)
        per_obj = angle_loss(
            pred_bin, pred_off, truth_angle, theta_range, mc.angle_bin_overlap
        )
        return tc.loss_lambda_angle * (valid_f * per_obj).sum() / n_valid

    l_roll = jnp.zeros(())
    if prediction.roll_bin is not None:
        l_roll = angle_term(
            prediction.roll_bin, prediction.roll_offset, truth.roll, "roll"
        )
        total = total + l_roll

    l_pitch = jnp.zeros(())
    if prediction.pitch_bin is not None:
        l_pitch = angle_term(
            prediction.pitch_bin, prediction.pitch_offset, truth.pitch, "pitch"
        )
        total = total + l_pitch

    l_yaw = jnp.zeros(())
    if prediction.yaw_bin is not None:
        l_yaw = angle_term(
            prediction.yaw_bin, prediction.yaw_offset, truth.yaw, "yaw"
        )
        total = total + l_yaw

    l_depth = jnp.zeros(())
    if prediction.depth is not None:
        pred_depth = gather_at_cells(prediction.depth, out_index)[..., 0]  # [B, N]
        per_obj = depth_loss(pred_depth, truth.depth)
        l_depth = tc.loss_lambda_depth * (valid_f * per_obj).sum() / n_valid
        total = total + l_depth

    return CenternetLosses(
        total=total,
        heatmap=l_heatmap,
        keypoint_heatmap=l_keypoint_heatmap,
        keypoint_affinity=l_keypoint_affinity,
        offset=l_offset,
        size=l_size,
        roll=l_roll,
        pitch=l_pitch,
        yaw=l_yaw,
        depth=l_depth,
        avg_size_error=avg_size_error,
        max_size_error=max_size_error,
    )
