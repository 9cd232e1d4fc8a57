"""Train state: params + optimizer + BN statistics."""

from __future__ import annotations

from typing import Any

import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def adam_with_clip(lr: float, grad_max_norm: float) -> optax.GradientTransformation:
    """Adam + global-norm clipping, the reference's optimizer recipe
    (centernet/scripts/train.py:196,70; yolact/scripts/train.py:411,255)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_max_norm),
        optax.adam(lr),
    )


def warmup_adam(
    lr: float, warmup_steps: int, grad_max_norm: float
) -> optax.GradientTransformation:
    """Adam with linear warmup (yolo_pose/scripts/train.py:337-344)."""
    schedule = optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
    return optax.chain(
        optax.clip_by_global_norm(grad_max_norm),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
