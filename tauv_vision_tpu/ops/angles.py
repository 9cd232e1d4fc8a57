"""Two-bin angle codec (Mousavian-style multibin with 2 bins).

Parity targets:
- angle_get_bins    centernet/model/decode.py:672-678
- angle_in_range    centernet/model/loss.py:320-331
- angle_loss        centernet/model/loss.py:334-376
- angle_decode      centernet/model/decode.py:681-706

An angle (already reduced modulo the per-class ``theta_range``) is mapped
to [0, 2*pi), classified into two overlapping half-circle bins, and
regressed as (sin, cos) offsets from each bin center.  Predictions carry
4 bin logits ([outside, inside] per bin) and 4 offsets
([sin0, cos0, sin1, cos1]).
"""

from __future__ import annotations

from math import pi
from typing import Tuple

import jax
import jax.numpy as jnp


def angle_get_bins(bin_overlap: float):
    """((center, min, max) for bin 0, bin 1). Bin 0 spans the upper half
    circle, bin 1 the lower, each widened by ``bin_overlap``."""
    bin_0 = (pi / 2, -bin_overlap / 2, pi + bin_overlap / 2)
    bin_1 = (-pi / 2, -pi - bin_overlap / 2, bin_overlap / 2)
    return bin_0, bin_1


def angle_in_range(
    angles: jnp.ndarray, range_min: float, range_max: float
) -> jnp.ndarray:
    """Elementwise test that angle lies in [range_min, range_max] mod 2*pi."""
    two_pi = 2 * pi
    range_min = range_min % two_pi
    range_max = range_max % two_pi
    angles = angles % two_pi
    if range_min < range_max:
        return (range_min <= angles) & (angles <= range_max)
    return (range_min <= angles) | (angles <= range_max)


def angle_encode(
    truth: jnp.ndarray, theta_range: jnp.ndarray, bin_overlap: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Targets for the two-bin codec.

    Args:
      truth: [...] angles (radians).
      theta_range: [...] per-element modulo (e.g. 2*pi, or pi/2 for a
        square-symmetric object).
    Returns:
      inside: [..., 2] int32 {0,1} bin membership,
      offsets: [..., 2, 2] (sin, cos) offsets from each bin center.
    """
    truth = truth % theta_range
    truth = truth * (2 * pi / theta_range)

    (c0, lo0, hi0), (c1, lo1, hi1) = angle_get_bins(bin_overlap)

    inside = jnp.stack(
        (
            angle_in_range(truth, lo0, hi0),
            angle_in_range(truth, lo1, hi1),
        ),
        axis=-1,
    ).astype(jnp.int32)

    offsets = jnp.stack(
        (
            jnp.stack((jnp.sin(truth - c0), jnp.cos(truth - c0)), axis=-1),
            jnp.stack((jnp.sin(truth - c1), jnp.cos(truth - c1)), axis=-1),
        ),
        axis=-2,
    )
    return inside, offsets


def angle_loss(
    predicted_bin: jnp.ndarray,
    predicted_offset: jnp.ndarray,
    truth: jnp.ndarray,
    theta_range: jnp.ndarray,
    bin_overlap: float,
) -> jnp.ndarray:
    """Per-element two-bin loss: CE on each bin's [outside, inside] logits
    plus L1 on (sin, cos) offsets for bins containing the truth.

    Args:
      predicted_bin: [..., 4] logits.
      predicted_offset: [..., 4] offsets.
      truth, theta_range: [...].
    Returns:
      [...] loss.
    """
    inside, offsets = angle_encode(truth, theta_range, bin_overlap)

    def bin_ce(logits2, label):
        logp = jax.nn.log_softmax(logits2, axis=-1)
        return -jnp.take_along_axis(logp, label[..., None], axis=-1)[..., 0]

    ce0 = bin_ce(predicted_bin[..., 0:2], inside[..., 0])
    ce1 = bin_ce(predicted_bin[..., 2:4], inside[..., 1])

    l1_0 = jnp.abs(predicted_offset[..., 0:2] - offsets[..., 0, :]).sum(axis=-1)
    l1_1 = jnp.abs(predicted_offset[..., 2:4] - offsets[..., 1, :]).sum(axis=-1)

    return (
        ce0
        + ce1
        + inside[..., 0].astype(jnp.float32) * l1_0
        + inside[..., 1].astype(jnp.float32) * l1_1
    )


def angle_decode(
    predicted_bin: jnp.ndarray,
    predicted_offset: jnp.ndarray,
    theta_range: float,
    bin_overlap: float,
) -> jnp.ndarray:
    """Pick the higher-confidence bin, recover the angle as
    ``bin_center + atan2(sin, cos)``, then rescale to [0, theta_range)."""
    (c0, _, _), (c1, _, _) = angle_get_bins(bin_overlap)

    score0 = jax.nn.softmax(predicted_bin[..., 0:2], axis=-1)[..., 1]
    score1 = jax.nn.softmax(predicted_bin[..., 2:4], axis=-1)[..., 1]
    use_bin_1 = score1 > score0

    angle0 = c0 + jnp.arctan2(predicted_offset[..., 0], predicted_offset[..., 1])
    angle1 = c1 + jnp.arctan2(predicted_offset[..., 2], predicted_offset[..., 3])

    angle = jnp.where(use_bin_1, angle1, angle0)
    angle = angle % (2 * pi)
    return angle * (theta_range / (2 * pi))
