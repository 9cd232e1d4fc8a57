"""serving/compiler.py: tuned XLA:TPU option gating.

The tuned options must never reach XLA:CPU (the test mesh) — TPU-only
flags fail CPU compilation — and the env override must parse and
disable correctly.
"""

import jax.numpy as jnp

from tauv_vision_tpu.serving.compiler import (
    TUNED_TPU_OPTIONS,
    serving_compiler_options,
    serving_jit,
)


def test_cpu_backend_gets_no_tpu_options(monkeypatch):
    monkeypatch.delenv("TAUV_XLA_OPTIONS", raising=False)
    # conftest pins the suite to CPU devices.
    assert serving_compiler_options() is None


def test_env_override_parses(monkeypatch):
    monkeypatch.setenv(
        "TAUV_XLA_OPTIONS", "xla_foo=1,xla_bar=true"
    )
    assert serving_compiler_options() == {
        "xla_foo": "1", "xla_bar": "true"
    }


def test_env_empty_disables(monkeypatch):
    monkeypatch.setenv("TAUV_XLA_OPTIONS", "")
    assert serving_compiler_options() is None


def test_serving_jit_runs_on_cpu(monkeypatch):
    monkeypatch.delenv("TAUV_XLA_OPTIONS", raising=False)
    fn = serving_jit(lambda x: x * 2 + 1)
    assert float(fn(jnp.float32(3.0))) == 7.0
    # decorator-with-kwargs form
    fn2 = serving_jit(static_argnums=1)(lambda x, n: x * n)
    assert float(fn2(jnp.float32(2.0), 3)) == 6.0


def test_tuned_options_are_strings():
    assert all(
        isinstance(k, str) and isinstance(v, str)
        for k, v in TUNED_TPU_OPTIONS.items()
    )
