"""Per-input-channel activation quantization + bias correction
(serving/quantize.py calibrate(per_channel=True) /
calibrate_bias_correction, consumed by serving/quantize_chain.py).

The decoded-parity target (BASELINE.json: decoded outputs within 1e-3)
needs the int8 serving path's error driven well below what per-tensor
absmax calibration gives; these tests pin the math of the two
refinements on shapes where the exact answer is checkable.
"""

from math import pi

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.serving.quantize import (
    calibrate,
    calibrate_bias_correction,
    quantized_call,
    strip_scales,
)
from tauv_vision_tpu.serving.quantize_chain import ChainCtx


class _TwoConv(nn.Module):
    """conv -> relu -> conv, channels wide enough to quantize."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), padding=1, name="c1")(x)
        x = nn.relu(x)
        return nn.Conv(8, (3, 3), padding=1, name="c2")(x)


def _skewed_input(rng, shape):
    """Per-channel ranges spanning ~2 orders of magnitude: the case
    per-tensor scales handle worst (post-BN-ReLU activations look like
    this)."""
    x = rng.normal(size=shape).astype(np.float32)
    gains = np.logspace(-1.0, 1.0, shape[-1], dtype=np.float32)
    return jnp.asarray(x * gains)


def _setup():
    model = _TwoConv()
    rng = np.random.default_rng(3)
    x = _skewed_input(rng, (2, 16, 16, 16))
    variables = model.init(jax.random.key(0), x)
    apply_fn = lambda b: model.apply(variables, b)  # noqa: E731
    return model, variables, apply_fn, x


def test_per_channel_calibrate_shapes():
    _, _, apply_fn, x = _setup()
    scalar = calibrate(apply_fn, [x])
    vector = calibrate(apply_fn, [x], per_channel=True)
    assert set(scalar) == set(vector) == {"c1", "c2"}
    assert np.ndim(scalar["c1"]) == 0
    assert vector["c1"].shape == (16,)
    assert vector["c2"].shape == (32,)
    # The per-channel scales bracket the shared scale.
    assert vector["c1"].max() <= scalar["c1"] + 1e-12
    assert vector["c1"].min() < scalar["c1"]


def test_per_channel_beats_per_tensor():
    """On channel-skewed inputs, per-channel activation scales must cut
    the quantization error — by a large factor at the conv consuming the
    skewed input (the quiet channels get the full int8 grid instead of a
    sliver of the loudest channel's), and at least somewhat end to end
    (later convs see well-mixed activations, so their gain is smaller).
    """
    _, variables, apply_fn, x = _setup()
    ref = np.asarray(apply_fn(x), np.float64)

    scalar = calibrate(apply_fn, [x])
    vector = calibrate(apply_fn, [x], per_channel=True)
    out_s = np.asarray(quantized_call(apply_fn, scalar)(x), np.float64)
    out_v = np.asarray(quantized_call(apply_fn, vector)(x), np.float64)

    err_s = np.abs(out_s - ref).mean()
    err_v = np.abs(out_v - ref).mean()
    assert err_v < err_s, (err_v, err_s)

    # First conv alone (the skewed-input consumer).  Note the gain is
    # structurally bounded: folding s_in into the weights moves the
    # channel skew from the activation grid into the per-output-channel
    # weight grid, so int8's ~2^-7 per-tap precision remains the floor
    # (this is why the serving config pairs per-channel with bias
    # correction and a bf16 tail rather than relying on it alone).
    ctx_s = ChainCtx(variables, scalar, dtype=jnp.float32)
    ctx_v = ChainCtx(variables, vector, dtype=jnp.float32)
    import flax.linen as nn

    ref1 = np.asarray(
        nn.Conv(32, (3, 3), padding=1).apply(
            {"params": variables["params"]["c1"]}, x
        ),
        np.float64,
    )
    e1_s = np.abs(
        np.asarray(ctx_s.run_layer(x, "c1", padding=1), np.float64) - ref1
    ).mean()
    e1_v = np.abs(
        np.asarray(ctx_v.run_layer(x, "c1", padding=1), np.float64) - ref1
    ).mean()
    assert e1_v < 0.8 * e1_s, (e1_v, e1_s)


def test_chain_per_channel_matches_per_layer():
    """ChainCtx.run_layer with vector scales computes the same fold-into
    -weights math as the per-layer interceptor."""
    _, variables, apply_fn, x = _setup()
    vector = calibrate(apply_fn, [x], per_channel=True)

    ctx = ChainCtx(variables, vector, dtype=jnp.float32)
    h = ctx.run_layer(x, "c1", padding=1, act="relu")
    chain_out = np.asarray(ctx.run_layer(h, "c2", padding=1))

    per_layer = np.asarray(quantized_call(apply_fn, vector)(x))
    np.testing.assert_allclose(chain_out, per_layer, atol=2e-5, rtol=1e-4)


def test_bias_correction_removes_systematic_error():
    _, variables, apply_fn, x = _setup()
    vector = calibrate(apply_fn, [x], per_channel=True)
    corr = calibrate_bias_correction(apply_fn, [x], vector)
    assert set(corr) == {"c1", "c2"}
    assert corr["c1"].shape == (32,)
    assert corr["c2"].shape == (8,)

    ref = np.asarray(apply_fn(x), np.float64)

    def chain_out(corrections):
        ctx = ChainCtx(variables, vector, dtype=jnp.float32,
                       corrections=corrections)
        h = ctx.run_layer(x, "c1", padding=1, act="relu")
        return np.asarray(ctx.run_layer(h, "c2", padding=1), np.float64)

    # On the calibration batch itself, the per-channel mean error of the
    # corrected chain must shrink (that is what was folded in).
    bias_plain = np.abs((chain_out(None) - ref).mean(axis=(0, 1, 2)))
    bias_corr = np.abs((chain_out(corr) - ref).mean(axis=(0, 1, 2)))
    assert bias_corr.mean() < bias_plain.mean(), (
        bias_corr.mean(), bias_plain.mean()
    )


def test_strip_scales_leaves_layer_bf16():
    _, variables, apply_fn, x = _setup()
    vector = calibrate(apply_fn, [x], per_channel=True)
    stripped = strip_scales(vector, ("c2",))
    assert set(stripped) == {"c1"}

    ref = np.asarray(apply_fn(x), np.float64)
    ctx = ChainCtx(variables, stripped, dtype=jnp.float32)
    h = ctx.run_layer(x, "c1", padding=1, act="relu", next_path="c2")
    assert h.dtype == jnp.float32  # c2 uncalibrated -> no requant
    out = np.asarray(ctx.run_layer(h, "c2", padding=1), np.float64)

    # The second conv now runs float: the only error left is c1's int8.
    full = calibrate(apply_fn, [x], per_channel=True)
    ctx_full = ChainCtx(variables, full, dtype=jnp.float32)
    h2 = ctx_full.run_layer(x, "c1", padding=1, act="relu", next_path="c2")
    out_full = np.asarray(ctx_full.run_layer(h2, "c2", padding=1),
                          np.float64)
    assert np.abs(out - ref).mean() <= np.abs(out_full - ref).mean()


@pytest.mark.slow
def test_dla34_chain_per_channel_tightens_decode():
    """End-to-end on a tiny CenterpointDLA34: per-channel + bias
    correction + bf16 heads must tighten the chain's heatmap error vs
    the float path compared to plain absmax (the round-3 serving
    configuration; cites centerpoint_dla.py:476-531)."""
    from tauv_vision_tpu.configs import (
        AngleConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34
    from tauv_vision_tpu.serving.quantize_chain import dla34_chain_forward

    oc = ObjectConfigSet(configs=(
        ObjectConfig(
            id="square",
            yaw=AngleConfig(train=False, modulo=2 * pi),
            pitch=AngleConfig(train=False, modulo=2 * pi),
            roll=AngleConfig(train=False, modulo=2 * pi),
            train_depth=False, train_keypoints=False, keypoints=None,
        ),
    ))
    model = CenterpointDLA34(object_config=oc, dtype=jnp.float32,
                             deform=False)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(1), x, train=False)
    apply_fn = lambda b: model.apply(variables, b, train=False)  # noqa: E731

    ref = np.asarray(apply_fn(x).heatmap, np.float64)

    absmax = calibrate(apply_fn, [x])
    base = dla34_chain_forward(oc, variables, absmax, dtype=jnp.float32)
    err_base = np.abs(np.asarray(base(x).heatmap, np.float64) - ref).mean()

    vec = strip_scales(
        calibrate(apply_fn, [x], per_channel=True), ("head_",)
    )
    corr = calibrate_bias_correction(apply_fn, [x], vec)
    tight = dla34_chain_forward(oc, variables, vec, dtype=jnp.float32,
                                corrections=corr)
    err_tight = np.abs(
        np.asarray(tight(x).heatmap, np.float64) - ref
    ).mean()

    assert err_tight < err_base, (err_tight, err_base)


def test_mse_refinement_picks_argmin_factor():
    """refine_scales_mse must return, per channel, the candidate scale
    minimizing the summed squared quantization error over the
    calibration data (verified against a manual grid evaluation).
    Whether that factor is < 1 depends on the tail-vs-resolution
    tradeoff at the data's sample count — the mechanism, not the
    statistics, is what's pinned here."""
    from tauv_vision_tpu.serving.quantize import refine_scales_mse

    _, variables, apply_fn, _ = _setup()
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.standard_t(df=4, size=(4, 16, 16, 16)).astype(np.float32)
    )

    base = calibrate(apply_fn, [x], per_channel=True)
    factors = (0.6, 0.8, 1.0)
    refined = refine_scales_mse(apply_fn, [x], base, factors=factors)
    assert set(refined) == set(base)
    assert refined["c1"].shape == base["c1"].shape

    # Manual argmin for c1 (its calibration input is x itself).
    flat = np.asarray(x, np.float64).reshape(-1, 16)
    s = np.asarray(base["c1"], np.float64)
    errs = []
    for f in factors:
        sf = s * f
        q = np.clip(np.round(flat / sf), -127, 127) * sf
        errs.append(np.square(flat - q).sum(axis=0))
    expected = s * np.asarray(factors)[np.argmin(np.stack(errs), axis=0)]
    np.testing.assert_allclose(np.asarray(refined["c1"]), expected,
                               rtol=1e-6)
