"""Tuned XLA:TPU compiler options for the serving pipelines.

This image's relay rejects TPU flags in client-side ``XLA_FLAGS`` (the
CPU-built client fails flag parsing on ``--xla_tpu_*``), but
``jax.jit(..., compiler_options=...)`` serializes options into the
per-executable compile request, which the TPU-side compiler honors —
verified live (scripts/xla_flags_probe.py).  That probe's interleaved
A/B sweep on the batch-128 north-star serving graph measured
``xla_tpu_scoped_vmem_limit_kib=32768`` (the fusion scratch budget;
larger budgets let the fuser keep conv producer/consumer chains in
VMEM) as a consistent win; see BENCH.md "XLA compiler options".

The options apply only on TPU backends — XLA:CPU (the test mesh) would
reject the TPU-only flags — and can be overridden with
``TAUV_XLA_OPTIONS`` ("k=v[,k=v...]", empty string disables).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

# Winner of the scripts/xla_flags_probe.py interleaved sweep (medians
# over 3 A/B rounds, batch-128 north-star graph, v5e): baseline 963.9
# fps, vmem24m +1.45%, vmem32m +1.97%, vmem48m +1.77%, vmem32m+latency-
# hiding scheduler +2.66% (989.6 fps).  See BENCH.md "XLA compiler
# options".
TUNED_TPU_OPTIONS = {
    "xla_tpu_scoped_vmem_limit_kib": "32768",
    "xla_tpu_enable_latency_hiding_scheduler": "true",
}


def serving_compiler_options() -> Optional[dict]:
    """Compiler options for serving-pipeline ``jax.jit`` calls.

    Returns the tuned TPU option set when the default backend is a TPU,
    ``None`` otherwise (CPU test meshes must not see TPU-only flags).
    ``TAUV_XLA_OPTIONS=k=v[,k=v...]`` overrides; ``TAUV_XLA_OPTIONS=``
    (empty) disables tuning entirely.
    """
    env = os.environ.get("TAUV_XLA_OPTIONS")
    if env is not None:
        env = env.strip()
        if not env:
            return None
        return dict(kv.split("=", 1) for kv in env.split(","))
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover — backend init failure
        return None
    return dict(TUNED_TPU_OPTIONS) if platform == "tpu" else None


def serving_jit(fun=None, **jit_kwargs):
    """``jax.jit`` with the tuned serving compiler options applied."""
    if fun is None:
        return lambda f: serving_jit(f, **jit_kwargs)
    return jax.jit(
        fun, compiler_options=serving_compiler_options(), **jit_kwargs
    )
