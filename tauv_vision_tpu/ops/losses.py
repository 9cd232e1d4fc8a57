"""Standalone loss primitives.

Parity targets:
- focal_loss  centernet/model/loss.py:302-317 (penalty-reduced CornerNet
  focal loss, normalized by the number of exact-peak pixels)
- smooth_l1   torch.nn.functional.smooth_l1_loss (beta=1)
- bce         torch.nn.functional.binary_cross_entropy with the clamping
  the reference applies around it (yolact/model/loss.py:96-101)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(
    prediction: jnp.ndarray, truth: jnp.ndarray, alpha: float, beta: float
) -> jnp.ndarray:
    """Penalty-reduced focal loss on probabilities.

    ``prediction`` must already be sigmoided.  Peak pixels are where
    ``truth ~= 1`` (isclose, matching the reference's torch.isclose);
    N = number of peaks over the whole tensor.  When N == 0 the negative
    term is dropped entirely, matching reference behavior (loss.py:312-315).
    Returns the elementwise loss map (caller sums).
    """
    p = jnp.isclose(truth, 1.0)
    n = jnp.sum(p)

    log_pred = jnp.log(jnp.clip(prediction, 1e-4))
    log_one_minus = jnp.log(jnp.clip(1.0 - prediction, 1e-4))

    loss_p = ((1.0 - prediction) ** alpha) * log_pred * p.astype(jnp.float32)
    loss_n = (
        ((1.0 - truth) ** beta)
        * (prediction**alpha)
        * log_one_minus
        * (1.0 - p.astype(jnp.float32))
    )

    return jnp.where(n == 0, -loss_p, -(loss_p + loss_n) / jnp.maximum(n, 1))


def smooth_l1(prediction: jnp.ndarray, truth: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Huber / smooth-L1, elementwise (torch default beta=1)."""
    diff = jnp.abs(prediction - truth)
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def binary_cross_entropy(
    prediction: jnp.ndarray, truth: jnp.ndarray, eps: float = 1e-4
) -> jnp.ndarray:
    """Elementwise BCE on probabilities with the reference's double clamp:
    both prediction and (float) target are clipped to [eps, 1-eps]."""
    p = jnp.clip(prediction, eps, 1.0 - eps)
    t = jnp.clip(truth, eps, 1.0 - eps)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE with integer labels (torch F.cross_entropy, no reduce)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
