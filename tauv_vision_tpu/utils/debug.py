"""Debug / tracing / profiling hooks.

SURVEY.md §5 equivalents:
- the reference enables autograd anomaly detection globally in several
  scripts (centernet/scripts/train.py:19) -> ``debug_mode()`` turns on
  jax's NaN debugging;
- ad-hoc wall-clock brackets around preprocess/forward/postprocess
  (yolact_node.py:106-138) -> ``StageTimer``;
- torchviz sat unused in requirements; the jax-native story is a real
  profiler: ``profile_trace()`` wraps ``jax.profiler`` so a serving or
  training region can be captured for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


def debug_mode(enable: bool = True) -> None:
    """NaN anomaly detection, the jax equivalent of
    torch.autograd.detect_anomaly(check_nan=True)."""
    import jax

    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def profile_trace(log_dir: str, name: Optional[str] = None):
    """Capture a jax profiler trace for the wrapped region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        if name is not None:
            with jax.profiler.TraceAnnotation(name):
                yield
        else:
            yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Per-stage wall-clock accumulation for serving loops
    (the yolact node's rospy.logdebug timing, made structural)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def means(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }

    def report(self) -> str:
        return " ".join(
            f"{name}={mean * 1e3:.2f}ms" for name, mean in self.means().items()
        )
