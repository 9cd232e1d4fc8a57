"""Inverse-sigmoid depth codec.

Parity targets:
- depth_decode  centernet/model/decode.py:709-714  (1/sigmoid(x) - 1)
- depth_loss    centernet/model/loss.py:379-390    (L1 in decoded space)

The network emits a raw logit; decoded depth is ``1/sigmoid(logit) - 1``
which maps (-inf, inf) -> (0, inf) with a well-conditioned gradient near
zero depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_decode(prediction: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jax.nn.sigmoid(prediction) - 1.0


def depth_encode(depth: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`depth_decode` (logit of 1/(depth+1))."""
    return jax.scipy.special.logit(1.0 / (depth + 1.0))


def depth_loss(prediction: jnp.ndarray, truth: jnp.ndarray) -> jnp.ndarray:
    """Elementwise L1 between decoded depth and truth."""
    return jnp.abs(depth_decode(prediction) - truth)
