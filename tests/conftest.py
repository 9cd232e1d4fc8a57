"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so data/model-parallel code paths
are exercised without TPU hardware (SURVEY.md §4: test DP via
xla_force_host_platform_device_count).

The session environment pins JAX_PLATFORMS to the real TPU tunnel and a
sitecustomize hook initializes jax on it before pytest even starts, so
setting env vars alone is not enough — we must also re-point the config
and drop the already-created backend.  CPU is the right target for unit
tests: parity tests are numerics-sensitive (the TPU rounds f32 matmuls
through bf16) and per-op dispatch over the tunnel is slow.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
if any(d.platform != "cpu" for d in jax.devices()):  # pragma: no cover
    import jax.extend.backend

    jax.extend.backend.clear_backends()

assert all(d.platform == "cpu" for d in jax.devices())

# NOTE: no persistent compilation cache here — XLA:CPU AOT cache entries
# record the compiling machine's CPU features and loading them on a host
# with different features warns "could lead to SIGILL" (observed when
# this image's remote compile service targets a different CPU).  The
# cache stays enabled for the TPU paths (bench, __graft_entry__), where
# the artifact targets the TPU rather than the host.
