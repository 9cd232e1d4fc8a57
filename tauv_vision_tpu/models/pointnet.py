"""DOPE-style belief/affinity prototype cascade ("Pointnet").

Parity target: ``yolo_pose/model/pointnet.py:10-100`` — stage 0 consumes
FPN features; later stages re-consume (belief, affinity, features)
concatenated; each stage is conv(k)+leaky x (count-1) -> 1x1 to the
stage's final depth -> leaky -> 1x1 to the prototype depth.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class PointnetStage(nn.Module):
    feature_depth: int
    final_depth: int
    out_depth: int
    kernel_size: int
    layer_count: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        x = nn.Conv(
            self.feature_depth, (k, k), padding=k // 2, dtype=self.dtype,
            name="conv_0",
        )(x)
        for i in range(self.layer_count - 2):
            x = nn.leaky_relu(x)
            x = nn.Conv(
                self.feature_depth, (k, k), padding=k // 2, dtype=self.dtype,
                name=f"conv_{i + 1}",
            )(x)
        x = nn.leaky_relu(x)
        x = nn.Conv(self.final_depth, (1, 1), dtype=self.dtype, name="reduce")(x)
        x = nn.leaky_relu(x)
        x = nn.Conv(self.out_depth, (1, 1), dtype=self.dtype, name="out")(x)
        return x


class Pointnet(nn.Module):
    pointnet_layers: Sequence[Tuple[int, int, int]]
    pointnet_feature_depth: int
    prototype_belief_depth: int
    prototype_affinity_depth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, fpn_output: jnp.ndarray
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        beliefs: List[jnp.ndarray] = []
        affinities: List[jnp.ndarray] = []

        belief = affinity = None
        for stage_i, (kernel, count, final_depth) in enumerate(
            self.pointnet_layers
        ):
            if stage_i == 0:
                x = fpn_output
            else:
                x = jnp.concatenate((belief, affinity, fpn_output), axis=-1)

            belief = PointnetStage(
                self.pointnet_feature_depth, final_depth,
                self.prototype_belief_depth, kernel, count,
                dtype=self.dtype, name=f"belief_{stage_i}",
            )(x)
            affinity = PointnetStage(
                self.pointnet_feature_depth, final_depth,
                self.prototype_affinity_depth, kernel, count,
                dtype=self.dtype, name=f"affinity_{stage_i}",
            )(
                jnp.concatenate((belief, affinity, fpn_output), axis=-1)
                if stage_i > 0 else fpn_output
            )
            beliefs.append(belief.astype(jnp.float32))
            affinities.append(affinity.astype(jnp.float32))

        return beliefs, affinities
