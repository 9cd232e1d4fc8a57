"""CenterNet decode into static-shape detection tensors.

Parity targets:
- decode            centernet/model/decode.py:569-626
- decode_keypoints  centernet/model/decode.py:441-566

The reference builds variable-length Python lists of Detection objects
and runs OpenCV PnP on host; here every output is a fixed ``n_detections``
tensor with a validity mask, the greedy keypoint->detection matcher is a
``lax.fori_loop``, and pose recovery is the pure-JAX LM PnP
(ops/pnp.py) — the whole decode stays on-device.

Deliberate bug-fixes vs the reference (SURVEY.md §7):
- keypoint/detection affinity angle errors are wrapped to [-pi, pi]
  (the reference compares raw ``abs(a - b)`` which mis-scores matches
  across the +-pi seam, decode.py:516-519);
- the PnP result is assigned to the detection that owns the keypoints,
  not the stale ``match_detection`` loop variable (decode.py:562).
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.configs.centernet import CenternetModelConfig, ObjectConfigSet
from tauv_vision_tpu.models.centernet import Prediction
from tauv_vision_tpu.ops.angles import angle_decode
from tauv_vision_tpu.ops.depth import depth_decode
from tauv_vision_tpu.ops.heatmap import gather_at_cells
from tauv_vision_tpu.ops.peaks import peak_decode
from tauv_vision_tpu.ops.pnp import solve_pnp_batch


@flax.struct.dataclass
class Detections:
    """[B, K]-shaped decoded detections with a validity mask."""

    valid: jnp.ndarray   # [B, K] bool (score >= threshold)
    score: jnp.ndarray   # [B, K]
    label: jnp.ndarray   # [B, K] int32
    y: jnp.ndarray       # [B, K] normalized center y
    x: jnp.ndarray       # [B, K]
    h: jnp.ndarray       # [B, K] normalized height
    w: jnp.ndarray       # [B, K]

    yaw: Optional[jnp.ndarray] = None    # [B, K]
    pitch: Optional[jnp.ndarray] = None
    roll: Optional[jnp.ndarray] = None
    depth: Optional[jnp.ndarray] = None


@flax.struct.dataclass
class KeypointDetections:
    detections: Detections
    # Per-detection keypoint slots (S = max keypoints over classes).
    keypoint_valid: jnp.ndarray      # [B, K, S] bool
    keypoint_y: jnp.ndarray          # [B, K, S] normalized
    keypoint_x: jnp.ndarray          # [B, K, S]
    keypoint_score: jnp.ndarray      # [B, K, S]
    keypoint_affinity: jnp.ndarray   # [B, K, S, 2]
    # PnP pose (cam_t_object).
    pose_valid: jnp.ndarray          # [B, K] bool
    pose_rotation: jnp.ndarray       # [B, K, 3, 3]
    pose_translation: jnp.ndarray    # [B, K, 3]
    pose_error: jnp.ndarray          # [B, K]


def decode(
    prediction: Prediction,
    model_config: CenternetModelConfig,
    n_detections: int,
    score_threshold: float,
) -> Detections:
    """Dense prediction maps -> top-k detections (decode.py:569-626)."""
    mc = model_config
    index, label, score = peak_decode(prediction.heatmap_nchw(), n_detections)

    size = gather_at_cells(prediction.size, index)      # [B, K, 2]
    offset = gather_at_cells(prediction.offset, index)  # [B, K, 2]

    iy = index[..., 0].astype(jnp.float32)
    ix = index[..., 1].astype(jnp.float32)
    y = (mc.downsample_ratio * iy + offset[..., 0]) / mc.in_h
    x = (mc.downsample_ratio * ix + offset[..., 1]) / mc.in_w

    def angle_at_cells(bin_head, offset_head):
        return angle_decode(
            gather_at_cells(bin_head, index),
            gather_at_cells(offset_head, index),
            2 * np.pi,
            mc.angle_bin_overlap,
        )

    yaw = pitch = roll = depth = None
    if prediction.yaw_bin is not None:
        yaw = angle_at_cells(prediction.yaw_bin, prediction.yaw_offset)
    if prediction.pitch_bin is not None:
        pitch = angle_at_cells(prediction.pitch_bin, prediction.pitch_offset)
    if prediction.roll_bin is not None:
        roll = angle_at_cells(prediction.roll_bin, prediction.roll_offset)
    if prediction.depth is not None:
        depth = depth_decode(gather_at_cells(prediction.depth, index)[..., 0])

    return Detections(
        valid=score >= score_threshold,
        score=score,
        label=label,
        y=y,
        x=x,
        h=size[..., 0],
        w=size[..., 1],
        yaw=yaw,
        pitch=pitch,
        roll=roll,
        depth=depth,
    )


def _keypoint_tables(object_config: ObjectConfigSet):
    """Static per-channel (owner label, local slot) tables and per-label
    padded 3D keypoint banks."""
    owner = np.asarray(object_config.keypoint_owner_labels(), np.int32)
    local = np.zeros(object_config.n_keypoints, np.int32)
    for flat in range(object_config.n_keypoints):
        _, local_i = object_config.decode_keypoint_index(flat)
        local[flat] = local_i

    max_slots = max(
        (len(c.keypoints) if c.keypoints is not None else 0)
        for c in object_config.configs
    )
    kp3d = np.zeros((object_config.n_labels, max_slots, 3), np.float32)
    kp3d_mask = np.zeros((object_config.n_labels, max_slots), bool)
    for li, c in enumerate(object_config.configs):
        if c.keypoints is None:
            continue
        for si, kp in enumerate(c.keypoints):
            kp3d[li, si] = kp
            kp3d_mask[li, si] = True
    return owner, local, kp3d, kp3d_mask, max_slots


def decode_keypoints(
    prediction: Prediction,
    model_config: CenternetModelConfig,
    object_config: ObjectConfigSet,
    projection_matrix: jnp.ndarray,
    n_detections: int,
    keypoint_n_detections: int,
    score_threshold: float,
    keypoint_score_threshold: float,
    pnp_iterations: int = 20,
) -> KeypointDetections:
    """Full keypoint decode (decode.py:441-566): detect objects + keypoint
    peaks, greedily assign each keypoint peak (score order) to the
    best-affinity-matching unclaimed detection of its owning class, then
    run PnP on detections with >= 6 claimed keypoints."""
    mc = model_config
    detections = decode(prediction, mc, n_detections, score_threshold)

    kp_index, kp_label, kp_score = peak_decode(
        prediction.keypoint_heatmap_nchw(), keypoint_n_detections
    )
    kp_valid = kp_score >= keypoint_score_threshold

    owner_np, local_np, kp3d_np, kp3d_mask_np, max_slots = _keypoint_tables(
        object_config
    )
    owner = jnp.asarray(owner_np)
    local = jnp.asarray(local_np)

    # Affinity vector at each keypoint peak:
    # prediction.keypoint_affinity is [B, H, W, C, 2]; gather at peaks of
    # channel c.
    b, h, w, c, _ = prediction.keypoint_affinity.shape
    aff_flat = prediction.keypoint_affinity.reshape(b, h * w, c, 2)
    cell = kp_index[..., 0] * w + kp_index[..., 1]  # [B, Kk]
    aff_at_cell = jnp.take_along_axis(
        aff_flat, cell[..., None, None].repeat(c, axis=-2), axis=1
    )  # [B, Kk, C, 2]
    kp_aff = jnp.take_along_axis(
        aff_at_cell, kp_label[..., None, None].astype(jnp.int32), axis=2
    )[..., 0, :]  # [B, Kk, 2]

    kp_y = kp_index[..., 0].astype(jnp.float32) / (mc.in_h // mc.downsample_ratio)
    kp_x = kp_index[..., 1].astype(jnp.float32) / (mc.in_w // mc.downsample_ratio)

    n_k = n_detections
    n_kk = keypoint_n_detections

    def match_sample(det_valid, det_label, det_y, det_x,
                     kp_valid_s, kp_label_s, kp_y_s, kp_x_s, kp_score_s,
                     kp_aff_s):
        slots_y = jnp.zeros((n_k, max_slots))
        slots_x = jnp.zeros((n_k, max_slots))
        slots_score = jnp.zeros((n_k, max_slots))
        slots_aff = jnp.zeros((n_k, max_slots, 2))
        claimed = jnp.zeros((n_k, max_slots), bool)

        def body(j, carry):
            slots_y, slots_x, slots_score, slots_aff, claimed = carry
            channel = kp_label_s[j]
            owner_label = owner[channel]
            slot = local[channel]

            aff_angle = jnp.arctan2(kp_aff_s[j, 0], kp_aff_s[j, 1])
            det_angle = jnp.arctan2(kp_y_s[j] - det_y, kp_x_s[j] - det_x)
            err = jnp.abs(
                jnp.mod(aff_angle - det_angle + jnp.pi, 2 * jnp.pi) - jnp.pi
            )  # wrapped (reference uses raw abs; see module docstring)

            candidate = (
                det_valid
                & (det_label == owner_label)
                & ~claimed[:, slot]
            )
            err = jnp.where(candidate, err, jnp.inf)
            best = jnp.argmin(err)
            assign = kp_valid_s[j] & jnp.isfinite(err[best])

            slots_y = slots_y.at[best, slot].set(
                jnp.where(assign, kp_y_s[j], slots_y[best, slot])
            )
            slots_x = slots_x.at[best, slot].set(
                jnp.where(assign, kp_x_s[j], slots_x[best, slot])
            )
            slots_score = slots_score.at[best, slot].set(
                jnp.where(assign, kp_score_s[j], slots_score[best, slot])
            )
            slots_aff = slots_aff.at[best, slot].set(
                jnp.where(assign, kp_aff_s[j], slots_aff[best, slot])
            )
            claimed = claimed.at[best, slot].set(
                claimed[best, slot] | assign
            )
            return slots_y, slots_x, slots_score, slots_aff, claimed

        return jax.lax.fori_loop(
            0, n_kk, body, (slots_y, slots_x, slots_score, slots_aff, claimed)
        )

    slots_y, slots_x, slots_score, slots_aff, claimed = jax.vmap(match_sample)(
        detections.valid, detections.label, detections.y, detections.x,
        kp_valid, kp_label, kp_y, kp_x, kp_score, kp_aff,
    )

    # ---- PnP per detection -------------------------------------------
    kp3d = jnp.asarray(kp3d_np)            # [L, S, 3]
    kp3d_mask = jnp.asarray(kp3d_mask_np)  # [L, S]

    object_points = kp3d[detections.label]         # [B, K, S, 3]
    slot_defined = kp3d_mask[detections.label]     # [B, K, S]
    pnp_mask = claimed & slot_defined

    image_points = jnp.stack(
        (slots_x * mc.in_w, slots_y * mc.in_h), axis=-1
    )  # [B, K, S, 2] (u, v) pixels — reference order decode.py:545

    bsz = object_points.shape[0]
    flat_pnp = solve_pnp_batch(
        object_points.reshape(bsz * n_k, max_slots, 3),
        image_points.reshape(bsz * n_k, max_slots, 2),
        projection_matrix,
        pnp_mask.reshape(bsz * n_k, max_slots),
        n_iterations=pnp_iterations,
        min_points=6,
    )

    return KeypointDetections(
        detections=detections,
        keypoint_valid=claimed,
        keypoint_y=slots_y,
        keypoint_x=slots_x,
        keypoint_score=slots_score,
        keypoint_affinity=slots_aff,
        pose_valid=flat_pnp.valid.reshape(bsz, n_k) & detections.valid,
        pose_rotation=flat_pnp.rotation.reshape(bsz, n_k, 3, 3),
        pose_translation=flat_pnp.translation.reshape(bsz, n_k, 3),
        pose_error=flat_pnp.error.reshape(bsz, n_k),
    )
