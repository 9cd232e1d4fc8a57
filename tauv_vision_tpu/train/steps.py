"""Jitted train/eval step factories for both detector families.

Each factory closes over the static configs and returns a function
``step(state, img, truth) -> (state, losses)`` jitted with data-parallel
shardings when a mesh is supplied: batch sharded over the data axis,
params/opt-state replicated, XLA inserting the gradient all-reduce over
ICI (SURVEY.md §2.9's DP design).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from tauv_vision_tpu.configs.centernet import (
    CenternetModelConfig,
    CenternetTrainConfig,
    ObjectConfigSet,
)
from tauv_vision_tpu.configs.yolact import YolactModelConfig, YolactTrainConfig
from tauv_vision_tpu.models.centernet import Centernet
from tauv_vision_tpu.models.yolact import Yolact
from tauv_vision_tpu.parallel.mesh import (
    batch_sharding,
    has_model_axis,
    replicated,
    small_map_guard,
    spatial_sharding,
)
import jax.numpy as jnp

from tauv_vision_tpu.train.centernet_task import CenternetTruth, centernet_loss


def dcn_offset_penalty(intermediates, offset_range: float) -> jnp.ndarray:
    """Mean squared out-of-range excess over every sown ``dcn_offset``
    tensor (models/centerpoint_dla.py DeformConvBlock).  Returns 0.0
    when the model has no DCN blocks."""
    leaves = [
        leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            intermediates
        )[0]
        if "dcn_offset" in jax.tree_util.keystr(path)
    ]
    if not leaves:
        return jnp.asarray(0.0, jnp.float32)
    excess_sq_sum = sum(
        jnp.sum(
            jnp.square(
                jnp.maximum(
                    jnp.abs(o.astype(jnp.float32)) - offset_range, 0.0
                )
            )
        )
        for o in leaves
    )
    count = sum(o.size for o in leaves)
    return excess_sq_sum / count
from tauv_vision_tpu.train.state import TrainState
from tauv_vision_tpu.train.watch import watch_metrics
from tauv_vision_tpu.train.yolact_task import YolactTruth, yolact_loss


def _maybe_shard(
    jit_kwargs: dict, mesh: Optional[Mesh], n_out: int = 2
) -> dict:
    if mesh is None:
        return jit_kwargs
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    # On a 2-D (data, model) mesh the image is additionally split along
    # width over the model axis (spatial partitioning); GSPMD propagates
    # the split through the convs with halo exchanges.  Truth tensors
    # stay batch-sharded: the losses reduce over space anyway.
    img = spatial_sharding(mesh) if has_model_axis(mesh) else data
    jit_kwargs["in_shardings"] = (rep, img, data)
    jit_kwargs["out_shardings"] = (rep,) * n_out
    return jit_kwargs


def make_centernet_train_step(
    model: Centernet,
    model_config: CenternetModelConfig,
    train_config: CenternetTrainConfig,
    object_config: ObjectConfigSet,
    mesh: Optional[Mesh] = None,
    watch: bool = False,
):
    reg = getattr(train_config, "loss_lambda_dcn_offset", 0.0)
    reg_range = getattr(train_config, "dcn_offset_range", 1.0)

    def loss_fn(params, batch_stats, img, truth: CenternetTruth):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"]
        if reg > 0:
            mutable.append("intermediates")
        with small_map_guard(mesh):
            prediction, mutated = model.apply(
                variables, img, train=True, mutable=mutable
            )
        losses = centernet_loss(
            prediction, truth, model_config, train_config, object_config
        )
        if reg > 0:
            # Penalize learned DCN offsets beyond the serving radius
            # (sown by DeformConvBlock): quadratic outside the range,
            # zero inside, so the R-bounded kernels become exact in
            # practice without biasing in-range offsets.
            penalty = dcn_offset_penalty(
                mutated.get("intermediates", {}), reg_range
            )
            losses = losses.replace(
                dcn_offset=penalty, total=losses.total + reg * penalty
            )
        return losses.total, (losses, mutated.get("batch_stats"))

    def step(state: TrainState, img, truth: CenternetTruth):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, img, truth
        )
        stats = watch_metrics(state.params, grads) if watch else None
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        if watch:
            return state, losses, stats
        return state, losses

    return jax.jit(
        step, **_maybe_shard({"donate_argnums": (0,)}, mesh, 3 if watch else 2)
    )


def make_centernet_eval_step(
    model: Centernet,
    model_config: CenternetModelConfig,
    train_config: CenternetTrainConfig,
    object_config: ObjectConfigSet,
    mesh: Optional[Mesh] = None,
):
    def step(state: TrainState, img, truth: CenternetTruth):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        with small_map_guard(mesh):
            prediction = model.apply(variables, img, train=False)
        return centernet_loss(
            prediction, truth, model_config, train_config, object_config
        )

    kwargs = {}
    if mesh is not None:
        img = spatial_sharding(mesh) if has_model_axis(mesh) else batch_sharding(mesh)
        kwargs["in_shardings"] = (
            replicated(mesh), img, batch_sharding(mesh)
        )
        kwargs["out_shardings"] = replicated(mesh)
    return jax.jit(step, **kwargs)


def make_yolact_train_step(
    model: Yolact,
    model_config: YolactModelConfig,
    train_config: YolactTrainConfig,
    mesh: Optional[Mesh] = None,
    watch: bool = False,
):
    def loss_fn(params, batch_stats, img, truth: YolactTruth):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        with small_map_guard(mesh):
            prediction, mutated = model.apply(
                variables, img, train=True, mutable=["batch_stats"]
            )
        losses = yolact_loss(prediction, truth, model_config, train_config)
        return losses.total, (losses, mutated.get("batch_stats"))

    def step(state: TrainState, img, truth: YolactTruth):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, img, truth
        )
        stats = watch_metrics(state.params, grads) if watch else None
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        if watch:
            return state, losses, stats
        return state, losses

    return jax.jit(
        step, **_maybe_shard({"donate_argnums": (0,)}, mesh, 3 if watch else 2)
    )


def make_yolact_eval_step(
    model: Yolact,
    model_config: YolactModelConfig,
    train_config: YolactTrainConfig,
    mesh: Optional[Mesh] = None,
):
    def step(state: TrainState, img, truth: YolactTruth):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        with small_map_guard(mesh):
            prediction = model.apply(variables, img, train=False)
        return yolact_loss(prediction, truth, model_config, train_config)

    kwargs = {}
    if mesh is not None:
        img = spatial_sharding(mesh) if has_model_axis(mesh) else batch_sharding(mesh)
        kwargs["in_shardings"] = (
            replicated(mesh), img, batch_sharding(mesh)
        )
        kwargs["out_shardings"] = replicated(mesh)
    return jax.jit(step, **kwargs)
