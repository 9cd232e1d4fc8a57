"""Checkpoint save/restore round-trip and trainer loop tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tauv_vision_tpu.train import TrainState, adam_with_clip
from tauv_vision_tpu.train.checkpoint import CheckpointManager
from tauv_vision_tpu.train.metrics import JsonlWriter, StdoutWriter, MultiWriter
from tauv_vision_tpu.train.trainer import Trainer, TrainerConfig


def _tiny_state(seed=0):
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3), padding=1)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            return nn.Dense(1)(x.mean(axis=(1, 2)))

    model = Tiny()
    x = jnp.zeros((2, 8, 8, 3))
    variables = model.init(jax.random.key(seed), x, train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(1e-3, 1.0),
    )
    return model, state, x


def test_checkpoint_roundtrip(tmp_path):
    model, state, x = _tiny_state()

    # Take one gradient step so opt_state is non-trivial.
    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, x
        )
        return (out**2).sum()

    grads = jax.grad(loss_fn)(state.params)
    state = state.apply_gradients(grads=grads)

    manager = CheckpointManager(tmp_path / "ckpts")
    manager.save(1, state, metrics={"val_loss": 0.5})
    assert manager.latest_step() == 1

    # Restore into a freshly initialized state.
    _, fresh, _ = _tiny_state(seed=1)
    restored = manager.restore(fresh)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.opt_state),
        jax.tree_util.tree_leaves(state.opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    manager.close()


def test_checkpoint_config_manifest(tmp_path):
    from tauv_vision_tpu.configs import CenternetModelConfig
    from math import pi

    manager = CheckpointManager(tmp_path / "ckpts")
    cfg = CenternetModelConfig(
        in_h=64, in_w=64, backbone_heights=(1,), backbone_channels=(8, 8),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    manager.save_configs({"model_config": cfg})
    loaded = CenternetModelConfig.from_dict(manager.load_config("model_config"))
    assert loaded == cfg
    manager.close()


def test_trainer_best_val_policy(tmp_path):
    """Trainer writes interval + best-val checkpoints and JSONL metrics."""
    model, state, x = _tiny_state()
    y = jnp.ones((2, 1))

    @jax.jit
    def train_step(state, img, truth):
        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, img
            )
            return ((out - truth) ** 2).sum()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)

        import flax.struct

        @flax.struct.dataclass
        class L:
            total: jnp.ndarray

        return state.apply_gradients(grads=grads), L(total=loss)

    manager = CheckpointManager(tmp_path / "ckpts")
    trainer = Trainer(
        train_step, None, state,
        TrainerConfig(n_epochs=3, epoch_n_batches=2, weight_save_interval=1),
        checkpoints=manager,
        writer=MultiWriter(
            StdoutWriter(), JsonlWriter(tmp_path / "metrics.jsonl")
        ),
    )
    trainer.fit(lambda: iter([(np.asarray(x), np.asarray(y))] * 2))

    assert manager.latest_step() is not None
    assert (tmp_path / "metrics.jsonl").exists()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 6  # 2 batches x 3 epochs
    # Loss decreased across training.
    import json

    first = json.loads(lines[0])["train/total"]
    last = json.loads(lines[-1])["train/total"]
    assert last < first
    manager.close()
