"""Bit-equivalence of the int8 phase-exact transposed-conv kernel
(ops/pallas/transpose_conv.py) against the XLA int8-sim reference
(lhs-dilated int8 conv + identical epilogue).

Integer accumulation is associative, so the kernel's phase GEMMs must
reproduce the dilated accumulator EXACTLY; the fused epilogue applies
the same f32 ops in the same order, so the whole comparison is
bit-equality, not closeness.  Parity context: the kernel serves the
YOLACT protonet upsamples (reference masknet.py:45-55) in the chain
int8 profiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.ops.pallas.transpose_conv import (
    phase_tap_matrices,
    transpose_conv2x_int8_pallas,
    transpose_conv2x_int8_phase_xla,
    transpose_conv2x_int8_xla,
)


def _case(rng, b, h, w, c):
    x = jnp.asarray(
        rng.integers(-127, 128, size=(b, h, w, c)), jnp.int8
    )
    qk = jnp.asarray(
        rng.integers(-127, 128, size=(3, 3, c, c)), jnp.int8
    )
    deq = jnp.asarray(
        rng.uniform(1e-4, 1e-2, size=(c,)).astype(np.float32)
    )
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    out_scale = jnp.asarray(
        rng.uniform(1e-3, 1e-1, size=(c,)).astype(np.float32)
    )
    return x, qk, deq, bias, out_scale


@pytest.mark.parametrize("h,w", [(6, 8), (4, 16)])
def test_phase_kernel_matches_dilated_int8(h, w):
    rng = np.random.default_rng(0)
    c = 128
    x, qk, deq, bias, out_scale = _case(rng, 2, h, w, c)

    ref = transpose_conv2x_int8_xla(x, qk, deq, bias, out_scale)
    got = transpose_conv2x_int8_pallas(
        x, phase_tap_matrices(qk), deq, bias, out_scale, interpret=True,
    )
    assert got.shape == (2, 2 * h, 2 * w, c) == ref.shape
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_phase_kernel_multi_row_blocks_and_halo():
    """rows_per_block < H exercises the halo spec (interior strips read
    the strip below's first row; the bottom strip zeroes it)."""
    rng = np.random.default_rng(1)
    c = 128
    x, qk, deq, bias, out_scale = _case(rng, 1, 6, 8, c)

    ref = transpose_conv2x_int8_xla(x, qk, deq, bias, out_scale)
    got = transpose_conv2x_int8_pallas(
        x, phase_tap_matrices(qk), deq, bias, out_scale,
        rows_per_block=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_phase_kernel_float_output():
    """out_dtype=bf16 skips requantization (the tail-rung form where
    the next conv runs float)."""
    rng = np.random.default_rng(2)
    c = 128
    x, qk, deq, bias, out_scale = _case(rng, 1, 4, 8, c)

    ref = transpose_conv2x_int8_xla(
        x, qk, deq, bias, out_scale, out_dtype=jnp.bfloat16
    )
    got = transpose_conv2x_int8_pallas(
        x, phase_tap_matrices(qk), deq, bias, out_scale,
        interpret=True, out_dtype=jnp.bfloat16,
    )
    np.testing.assert_array_equal(
        np.asarray(ref, np.float32), np.asarray(got, np.float32)
    )


@pytest.mark.parametrize("out_dtype", [jnp.int8, jnp.bfloat16])
def test_phase_xla_matches_dilated_int8(out_dtype):
    """The pure-XLA phase decomposition (four exact-tap int8 convs +
    per-phase epilogues + int8 interleave) is bit-equal to the dilated
    int8 reference — same integer taps, same accumulation, same f32
    epilogue order.  Odd extents exercise the shifted-axis zero pads."""
    rng = np.random.default_rng(4)
    c = 64
    for b, h, w in [(2, 6, 8), (1, 5, 7)]:
        x, qk, deq, bias, out_scale = _case(rng, b, h, w, c)
        ref = transpose_conv2x_int8_xla(
            x, qk, deq, bias, out_scale, out_dtype=out_dtype
        )
        got = transpose_conv2x_int8_phase_xla(
            x, qk, deq, bias, out_scale, out_dtype=out_dtype
        )
        assert got.shape == (b, 2 * h, 2 * w, c) == ref.shape
        np.testing.assert_array_equal(
            np.asarray(ref, np.float32), np.asarray(got, np.float32)
        )


def test_chain_phase_xla_transpose_matches_xla_sim():
    """run_layer's int8_transpose='phase-xla' branch produces the same
    activations as the 'xla' int8-sim branch through a real calibrated
    protonet link (upsample -> post), end to end."""
    from tauv_vision_tpu.serving.quantize_chain import ChainCtx

    rng = np.random.default_rng(5)
    c = 32
    kern = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.05
    kern_post = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.05
    variables = {"params": {
        "protonet": {
            "upsample_2": {
                "kernel": jnp.asarray(kern),
                "bias": jnp.asarray(
                    rng.normal(size=(c,)).astype(np.float32) * 0.1
                ),
            },
            "post_0": {
                "kernel": jnp.asarray(kern_post),
                "bias": jnp.asarray(
                    rng.normal(size=(c,)).astype(np.float32) * 0.1
                ),
            },
        },
    }}
    scales = {"protonet/upsample_2": 0.02, "protonet/post_0": 0.03}
    x = jnp.asarray(rng.normal(size=(1, 6, 8, c)) * 1.5, jnp.float32)

    outs = {}
    for impl in ("xla", "phase-xla"):
        ctx = ChainCtx(variables, scales, int8_transpose=impl)
        y = ctx.run_layer(
            x, "protonet/upsample_2", transpose=True, act="leaky",
            next_path="protonet/post_0",
        )
        outs[impl] = ctx.run_layer(y, "protonet/post_0", act="leaky")
    np.testing.assert_array_equal(
        np.asarray(outs["xla"], np.float32),
        np.asarray(outs["phase-xla"], np.float32),
    )


def test_dilated_int8_matches_float_transpose():
    """Sanity: the int8-sim reference itself decodes to ~the float
    transpose (quantization noise only), so the oracle isn't trivially
    wrong about the transpose geometry."""
    from tauv_vision_tpu.models.layers import TorchConvTranspose

    rng = np.random.default_rng(3)
    c = 32
    xf = rng.normal(size=(1, 5, 7, c)).astype(np.float32)
    mod = TorchConvTranspose(
        features=c, kernel_size=3, stride=2, padding=1, output_padding=1
    )
    variables = mod.init(jax.random.key(0), jnp.asarray(xf))
    kernel = variables["params"]["kernel"]
    bias = variables["params"]["bias"]
    ref = mod.apply(variables, jnp.asarray(xf))

    s_in = np.abs(xf).max() / 127.0
    xq = jnp.asarray(
        np.clip(np.round(xf / s_in), -127, 127), jnp.int8
    )
    kf = np.asarray(kernel, np.float32)
    w_scale = np.maximum(
        np.abs(kf.reshape(-1, c)).max(axis=0), 1e-6
    ) / 127.0
    qk = jnp.asarray(
        np.clip(np.round(kf / w_scale), -127, 127), jnp.int8
    )
    got = transpose_conv2x_int8_xla(
        xq, qk, s_in * w_scale, bias, 1.0,
        act="none", out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), atol=5e-2, rtol=0,
    )
