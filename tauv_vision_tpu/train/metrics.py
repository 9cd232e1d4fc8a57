"""Pluggable metric writers.

The reference logs every loss term per batch to Weights & Biases plus
matplotlib figures and checkpoint artifacts (SURVEY.md §5).  wandb is not
in this image, so the writer interface is pluggable: JSONL (always
available, machine-readable), stdout, and wandb when importable — with
the same per-loss-term granularity (centernet/scripts/train.py:62-74).
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Dict, Optional, Protocol


class MetricWriter(Protocol):
    def log(self, metrics: Dict[str, float], step: int) -> None: ...
    def log_figure(self, tag: str, figure, step: int) -> None: ...
    def close(self) -> None: ...


class StdoutWriter:
    def __init__(self, prefix: str = ""):
        self.prefix = prefix

    def log(self, metrics: Dict[str, float], step: int) -> None:
        parts = " ".join(f"{k}={v:.5g}" for k, v in metrics.items())
        print(f"{self.prefix}step={step} {parts}", flush=True)

    def log_figure(self, tag: str, figure, step: int) -> None:
        print(f"{self.prefix}step={step} figure {tag}", flush=True)

    def close(self) -> None:
        pass


class JsonlWriter:
    """Scalars to JSONL; figures to PNGs under ``<dir>/figures/`` with a
    JSONL record pointing at each (the W&B-figure analog,
    centernet/scripts/train.py:93-101)."""

    def __init__(self, path: pathlib.Path):
        self.path = pathlib.Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fp = open(self.path, "a")

    def log(self, metrics: Dict[str, float], step: int) -> None:
        record = {"step": step, "time": time.time(), **metrics}
        self._fp.write(json.dumps(record) + "\n")
        self._fp.flush()

    def log_figure(self, tag: str, figure, step: int) -> None:
        fig_dir = self.path.parent / "figures"
        fig_dir.mkdir(parents=True, exist_ok=True)
        out = fig_dir / f"{tag.replace('/', '_')}_{step:08d}.png"
        figure.savefig(out)
        record = {"step": step, "time": time.time(), "figure": tag,
                  "path": str(out)}
        self._fp.write(json.dumps(record) + "\n")
        self._fp.flush()

    def close(self) -> None:
        self._fp.close()


class WandbWriter:
    """Weights & Biases writer (no-op constructor failure is the caller's
    job to handle; utils/wandb_utils.py parity lives in utils)."""

    def __init__(self, project: str, config: Optional[dict] = None, **kwargs):
        import wandb  # deferred: not available in every image

        self._wandb = wandb
        self.run = wandb.init(project=project, config=config, **kwargs)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        self._wandb.log(metrics, step=step)

    def log_figure(self, tag: str, figure, step: int) -> None:
        self._wandb.log({tag: self._wandb.Image(figure)}, step=step)

    def close(self) -> None:
        self.run.finish()


class MultiWriter:
    def __init__(self, *writers: MetricWriter):
        self.writers = [w for w in writers if w is not None]

    def log(self, metrics: Dict[str, float], step: int) -> None:
        for w in self.writers:
            w.log(metrics, step)

    def log_figure(self, tag: str, figure, step: int) -> None:
        for w in self.writers:
            w.log_figure(tag, figure, step)

    def close(self) -> None:
        for w in self.writers:
            w.close()


def losses_to_metrics(losses, prefix: str) -> Dict[str, float]:
    """Flatten a *Losses struct into scalar metrics."""
    out = {}
    for field in losses.__dataclass_fields__:
        value = getattr(losses, field)
        if value is not None:
            out[f"{prefix}{field}"] = float(value)
    return out
