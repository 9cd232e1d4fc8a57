"""Orbax checkpointing with config-alongside-weights manifests.

The reference saves torch state_dicts per epoch ("latest" + interval
snapshots + best-val, centernet/scripts/train.py:226-234,
yolact/scripts/train.py:490-505) and uploads model/config JSONs as W&B
artifacts so inference can reconstruct the model (yolact_node.py:44-45).
Rebuild: an orbax CheckpointManager stores the train-state pytree and the
config JSONs live alongside it in the same directory.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from tauv_vision_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(
        self,
        directory: pathlib.Path,
        max_to_keep: Optional[int] = None,
        keep_period: Optional[int] = None,
    ):
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                keep_period=keep_period,
                create=True,
            ),
        )

    def save_configs(self, configs: Dict[str, Any]) -> None:
        """Persist config dataclasses (anything with to_dict) as JSON."""
        for name, config in configs.items():
            payload = config.to_dict() if hasattr(config, "to_dict") else config
            with open(self.directory / f"{name}.json", "w") as fp:
                json.dump(payload, fp, indent=2)

    def load_config(self, name: str) -> dict:
        with open(self.directory / f"{name}.json") as fp:
            return json.load(fp)

    def save(self, step: int, state: TrainState, metrics: Optional[dict] = None):
        self._manager.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        "opt_state": state.opt_state,
                        "step": state.step,
                    }
                )
            ),
            metrics=metrics,
        )
        self._manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into an abstract/zero state of matching structure."""
        if step is None:
            step = self._manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        target = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._manager.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(target)),
        )["state"]
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def close(self):
        self._manager.close()
