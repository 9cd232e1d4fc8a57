"""Unified trainer: the capability of the three per-family train scripts
(centernet/scripts/train.py, yolact/scripts/train.py,
yolo_pose/scripts/train.py) as one loop.

Features (SURVEY.md §5): per-batch per-loss-term metric logging, epoch
validation averages, "latest" + interval + best-val checkpoint policies,
warm-start from a checkpoint, single-batch-overfit debug mode, optional
grad-norm logging, DP-mesh execution.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

import jax

from tauv_vision_tpu.parallel.mesh import shard_batch
from tauv_vision_tpu.train.checkpoint import CheckpointManager
from tauv_vision_tpu.train.metrics import MetricWriter, StdoutWriter, losses_to_metrics
from tauv_vision_tpu.train.state import TrainState


@dataclass
class TrainerConfig:
    n_epochs: int
    epoch_n_batches: int          # batches per epoch (cycled loader cap)
    weight_save_interval: int = 1
    keep_best: bool = True        # best-val checkpoint (yolact policy)
    log_every: int = 1
    overfit_single_batch: bool = False
    # Log per-layer param/grad statistics every N steps (wandb.watch
    # equivalent, yolact/scripts/train.py:480).  Requires a train_step
    # built with watch=True (returns a third watch-metrics dict).
    watch_every: int = 0


class Trainer:
    def __init__(
        self,
        train_step: Callable,
        eval_step: Optional[Callable],
        state: TrainState,
        config: TrainerConfig,
        checkpoints: Optional[CheckpointManager] = None,
        writer: Optional[MetricWriter] = None,
        mesh=None,
        figure_fn: Optional[Callable] = None,
        watch_step: Optional[Callable] = None,
    ):
        self.train_step = train_step
        # Optional watch=True variant of train_step, used only on steps
        # where watch stats are actually logged — computing and pulling
        # the per-layer stats pytree every step costs device reductions
        # + a host sync that watch_every would otherwise discard.
        self.watch_step = watch_step
        self.eval_step = eval_step
        self.state = state
        self.config = config
        self.checkpoints = checkpoints
        self.writer = writer or StdoutWriter()
        self.mesh = mesh
        # figure_fn(state, img, truth) -> {tag: matplotlib Figure}, run on
        # validation batch 0 each epoch (the reference's per-val-epoch
        # figure logging, centernet/scripts/train.py:93-101).
        self.figure_fn = figure_fn
        self.global_step = int(state.step)
        self.best_val_loss = float("inf")

    def _put(self, batch):
        img, truth = batch
        import jax.numpy as jnp

        img = jnp.asarray(img)
        truth = jax.tree_util.tree_map(jnp.asarray, truth)
        if self.mesh is not None:
            img = shard_batch(img, self.mesh)
            truth = shard_batch(truth, self.mesh)
        return img, truth

    def _log_figures(self, img, truth):
        if self.figure_fn is None:
            return
        try:
            figures = self.figure_fn(self.state, img, truth)
            for tag, fig in figures.items():
                self.writer.log_figure(tag, fig, self.global_step)
                import matplotlib.pyplot as plt

                plt.close(fig)
        except Exception as exc:  # figures must never kill training
            print(f"figure logging failed: {exc}", flush=True)

    def run_train_epoch(self, batches: Iterable, epoch: int) -> float:
        total = 0.0
        count = 0
        cached = None
        for batch_i, batch in enumerate(batches):
            if batch_i >= self.config.epoch_n_batches:
                break
            if self.config.overfit_single_batch:
                if cached is None:
                    cached = self._put(batch)
                img, truth = cached
            else:
                img, truth = self._put(batch)
            if batch_i == 0 and self.eval_step is None:
                # No validation loop (the yolo_pose recipe): figures come
                # from train batch 0 instead, like the reference's
                # in-train belief plots (yolo_pose/scripts/train.py:227).
                self._log_figures(img, truth)

            t0 = time.perf_counter()
            step_fn = self.train_step
            if (
                self.watch_step is not None
                and self.config.watch_every > 0
                and self.global_step % self.config.watch_every == 0
            ):
                step_fn = self.watch_step
            result = step_fn(self.state, img, truth)
            watch_stats = None
            if len(result) == 3:
                self.state, losses, watch_stats = result
            else:
                self.state, losses = result
            if batch_i % self.config.log_every == 0:
                metrics = losses_to_metrics(losses, "train/")
                metrics["train/step_time"] = time.perf_counter() - t0
                metrics["epoch"] = epoch
                self.writer.log(metrics, self.global_step)
            if (
                watch_stats is not None
                and self.config.watch_every > 0
                and self.global_step % self.config.watch_every == 0
            ):
                self.writer.log(
                    {k: float(v) for k, v in watch_stats.items()},
                    self.global_step,
                )
            total += float(losses.total)
            count += 1
            self.global_step += 1
        return total / max(count, 1)

    def run_validation_epoch(self, batches: Iterable, epoch: int) -> float:
        if self.eval_step is None:
            return float("nan")
        total = 0.0
        count = 0
        sums: dict = {}
        for batch_i, batch in enumerate(batches):
            img, truth = self._put(batch)
            if batch_i == 0:
                self._log_figures(img, truth)
            losses = self.eval_step(self.state, img, truth)
            for k, v in losses_to_metrics(losses, "val/").items():
                sums[k] = sums.get(k, 0.0) + v
            total += float(losses.total)
            count += 1
        if count:
            self.writer.log(
                {k: v / count for k, v in sums.items()} | {"epoch": epoch},
                self.global_step,
            )
        return total / max(count, 1)

    def maybe_checkpoint(self, epoch: int, val_loss: float, configs=None):
        if self.checkpoints is None:
            return
        if configs and epoch == 0:
            self.checkpoints.save_configs(configs)
        interval = self.config.weight_save_interval
        is_interval = interval > 0 and (epoch % interval == 0)
        is_best = self.config.keep_best and val_loss < self.best_val_loss
        if is_best:
            self.best_val_loss = val_loss
        if is_interval or is_best:
            self.checkpoints.save(
                self.global_step, self.state,
                metrics={"val_loss": val_loss, "epoch": epoch},
            )

    def fit(
        self,
        train_batches_fn: Callable[[], Iterable],
        val_batches_fn: Optional[Callable[[], Iterable]] = None,
        configs: Optional[dict] = None,
    ) -> TrainState:
        for epoch in range(self.config.n_epochs):
            train_loss = self.run_train_epoch(train_batches_fn(), epoch)
            val_loss = (
                self.run_validation_epoch(val_batches_fn(), epoch)
                if val_batches_fn is not None
                else train_loss
            )
            self.maybe_checkpoint(epoch, val_loss, configs)
            print(
                f"epoch {epoch}: train={train_loss:.5g} val={val_loss:.5g}",
                flush=True,
            )
        return self.state
