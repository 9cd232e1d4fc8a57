"""Runtime capability probes for serving.

Round 2 found that one specific compiled composition — the YOLO-Pose
belief-einsum -> argmax decode with batched LM PnP fused into the SAME
program — intermittently kills this image's TPU worker, while every
ingredient runs fine on its own and the same PnP fused into the
CenterNet keypoint pipeline is stable (BENCH.md "YOLO-Pose pipeline";
the full bisect ladder is scripts/pnp_fusion_repro.py).  That makes the
fault a property of the runtime, not of the model: serving should probe
the runtime once instead of hardcoding the workaround.

``fused_pnp_supported()`` compiles and runs the minimal crashing
composition in a SUBPROCESS (a worker crash must not take serving
down), caches the verdict per device kind, and lets the environment
override it (``TAUV_FUSED_PNP=0/1``).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
from typing import Optional

_PROBE_SNIPPET = """
import jax, jax.numpy as jnp, numpy as np
from tauv_vision_tpu.ops.pnp import solve_pnp_batch
rng = np.random.default_rng(0)
coeff = jnp.asarray(rng.normal(size=(4, 10, 9, 16)).astype(np.float32))
proto = jnp.asarray(rng.normal(size=(4, 60, 120, 16)).astype(np.float32))
cam = jnp.asarray([[700., 0, 480.], [0, 700., 240.], [0, 0, 1.]])
obj = jnp.asarray(rng.normal(size=(9, 3)).astype(np.float32))
@jax.jit
def fn(coeff, proto):
    belief = jax.nn.sigmoid(jnp.einsum(
        "bkqp,bhwp->bkqhw", coeff, proto,
        preferred_element_type=jnp.float32))
    bh, bw = belief.shape[-2:]
    flat = belief.reshape(*belief.shape[:-2], bh * bw)
    idx = jnp.argmax(flat, axis=-1)
    y = (idx // bw).astype(jnp.float32) / bh * 480
    x = (idx % bw).astype(jnp.float32) / bw * 960
    pts = jnp.stack((x, y), axis=-1)
    b, k, n = pts.shape[:3]
    res = solve_pnp_batch(
        jnp.broadcast_to(obj[None, None], (b, k, n, 3)).reshape(b * k, n, 3),
        pts.reshape(b * k, n, 2), cam,
        jnp.max(flat, axis=-1).reshape(b * k, n) > 0.3,
        n_iterations=20, min_points=4)
    return res.translation.sum() + belief.sum()
for _ in range(2):
    print(float(fn(coeff, proto)))
"""


def _cache_path() -> pathlib.Path:
    return (
        pathlib.Path(__file__).resolve().parents[2]
        / ".jax_cache" / "fused_pnp_probe.json"
    )


def _device_kind() -> str:
    import jax

    try:
        return jax.devices()[0].device_kind
    except Exception:  # pragma: no cover - no backend
        return "unknown"


def fused_pnp_supported(refresh: bool = False,
                        timeout: int = 600) -> bool:
    """True when the fused decode+PnP composition runs on this runtime.

    Order: ``TAUV_FUSED_PNP`` env override, cached verdict for this
    device kind, else a one-time subprocess probe (compile + run the
    minimal composition twice).
    """
    env = os.environ.get("TAUV_FUSED_PNP")
    if env is not None:
        return env not in ("0", "false", "False")

    kind = _device_kind()
    cache = _cache_path()
    if not refresh and cache.exists():
        try:
            verdicts = json.loads(cache.read_text())
            if kind in verdicts:
                return bool(verdicts[kind])
        except (json.JSONDecodeError, OSError):
            pass

    ok = _run_probe(timeout)
    try:
        cache.parent.mkdir(exist_ok=True)
        verdicts = {}
        if cache.exists():
            try:
                verdicts = json.loads(cache.read_text())
            except json.JSONDecodeError:
                verdicts = {}
        verdicts[kind] = ok
        cache.write_text(json.dumps(verdicts))
    except OSError:  # pragma: no cover - read-only fs
        pass
    return ok


def _run_probe(timeout: int) -> bool:
    env = dict(os.environ)
    root = str(pathlib.Path(__file__).resolve().parents[2])
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SNIPPET],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0
