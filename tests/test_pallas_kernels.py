"""Pallas kernel parity tests.

These run the kernels in interpreter mode on the CPU suite (the real
Mosaic lowering is exercised on hardware by the bench and was verified
on a v5e: peak decode exact, mask assembly within 8e-3 of the XLA path —
the kernel keeps true-f32 accumulation while XLA's f32 matmul rounds
through bf16 on TPU).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from tauv_vision_tpu.ops.masks import assemble_mask_batch
from tauv_vision_tpu.ops.pallas import mask_assembly, peak_decode
from tauv_vision_tpu.ops.peaks import peak_decode as peak_decode_xla


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    original = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(original, interpret=True)
    )
    # The kernel modules closed over pl.pallas_call at import time? No —
    # they call pl.pallas_call at trace time, so the patch takes effect.
    yield


def test_peak_decode_kernel_matches_xla():
    rng = np.random.default_rng(0)
    hm = jnp.asarray(rng.normal(size=(2, 3, 24, 32)).astype(np.float32) * 3)
    i1, l1, s1 = peak_decode.peak_decode_pallas(hm, 7)
    i2, l2, s2 = peak_decode_xla(hm, 7)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_mask_assembly_kernel_matches_xla():
    rng = np.random.default_rng(1)
    proto = jnp.asarray(rng.normal(size=(2, 4, 24, 32)).astype(np.float32))
    coeff = jnp.asarray(rng.normal(size=(2, 6, 4)).astype(np.float32))
    box = jnp.asarray(
        np.concatenate(
            [rng.uniform(0.3, 0.7, (2, 6, 2)), rng.uniform(0.2, 0.5, (2, 6, 2))],
            -1,
        ).astype(np.float32)
    )
    m1 = mask_assembly.assemble_mask_pallas(proto, coeff, box)
    m2 = assemble_mask_batch(proto, coeff, box)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


def test_mask_assembly_kernel_no_crop():
    rng = np.random.default_rng(2)
    proto = jnp.asarray(rng.normal(size=(1, 4, 16, 16)).astype(np.float32))
    coeff = jnp.asarray(rng.normal(size=(1, 3, 4)).astype(np.float32))
    m1 = mask_assembly.assemble_mask_pallas(proto, coeff, None, crop=False)
    m2 = assemble_mask_batch(proto, coeff)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


def test_deform_conv_pallas_matches_gather():
    """The Pallas DCN kernel vs the torchvision-exact gather formulation
    (ops/deform_conv.py) with offsets inside the shift window."""
    from tauv_vision_tpu.ops.deform_conv import deform_conv2d
    from tauv_vision_tpu.ops.pallas.deform_conv import deform_conv2d_pallas

    rng = np.random.default_rng(3)
    b, h, w, c, o, r = 2, 11, 16, 8, 8, 2
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-r, r, (b, h, w, 18)).astype(np.float32)
    )
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32))
    weight = jnp.asarray(
        (rng.standard_normal((3, 3, c, o)) * 0.2).astype(np.float32)
    )
    bias = jnp.asarray(rng.standard_normal(o).astype(np.float32))

    ref = deform_conv2d(x, offset, mask, weight, bias, stride=1, padding=1)
    got = deform_conv2d_pallas(
        x, offset, mask, weight, bias, padding=1, max_offset=r,
        cols_per_block=8, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_deform_conv_pallas_no_mask_uneven_strips():
    from tauv_vision_tpu.ops.deform_conv import deform_conv2d
    from tauv_vision_tpu.ops.pallas.deform_conv import deform_conv2d_pallas

    rng = np.random.default_rng(4)
    b, h, w, c, o, r = 1, 7, 10, 4, 4, 1  # 10 cols: 2nd block is partial
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-r, r, (b, h, w, 18)).astype(np.float32)
    )
    weight = jnp.asarray(
        (rng.standard_normal((3, 3, c, o)) * 0.2).astype(np.float32)
    )
    ref = deform_conv2d(x, offset, None, weight, None, stride=1, padding=1)
    got = deform_conv2d_pallas(
        x, offset, None, weight, None, padding=1, max_offset=r,
        cols_per_block=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_deform_conv_pallas_batch_pair_packing():
    """c == 64 with even batch takes the batch-pair lane-packing path
    (2x VPU utilization for the production 64-ch DCN layers) — must
    match the gather reference exactly like the unpacked path."""
    from tauv_vision_tpu.ops.deform_conv import deform_conv2d
    from tauv_vision_tpu.ops.pallas.deform_conv import deform_conv2d_pallas

    rng = np.random.default_rng(5)
    b, h, w, c, o, r = 4, 9, 12, 64, 64, 1
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-r, r, (b, h, w, 18)).astype(np.float32)
    )
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32))
    weight = jnp.asarray(
        (rng.standard_normal((3, 3, c, o)) * 0.1).astype(np.float32)
    )
    bias = jnp.asarray(rng.standard_normal(o).astype(np.float32))

    ref = deform_conv2d(x, offset, mask, weight, bias, stride=1, padding=1)
    got = deform_conv2d_pallas(
        x, offset, mask, weight, bias, padding=1, max_offset=r,
        cols_per_block=8, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_deform_conv_pallas_bf16_hat_variant():
    """The bf16-hat VPU-economy variant stays within bf16 sampling
    noise of the gather reference (the f32-hat path stays exact; this
    rung trades ~1e-2 absolute feature error for 2x VPU rate —
    decoded-level impact measured on chip, BENCH.md)."""
    from tauv_vision_tpu.ops.deform_conv import deform_conv2d
    from tauv_vision_tpu.ops.pallas.deform_conv import deform_conv2d_pallas

    rng = np.random.default_rng(7)
    b, h, w, c, o, r = 2, 11, 16, 8, 8, 1
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-r, r, (b, h, w, 18)).astype(np.float32)
    )
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32))
    weight = jnp.asarray(
        (rng.standard_normal((3, 3, c, o)) * 0.2).astype(np.float32)
    )
    ref = deform_conv2d(x, offset, mask, weight, None, stride=1, padding=1)
    got = deform_conv2d_pallas(
        x, offset, mask, weight, None, padding=1, max_offset=r,
        cols_per_block=8, interpret=True, variant="bf16_hat",
    )
    # bf16 hats: ~8-bit mantissa on weights in [0, 1] + bf16 shifted
    # reads -> absolute error ~1e-2 on unit-variance inputs.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0.1, atol=5e-2
    )
    # const_hat is a measurement rung: runs, right shape, finite.
    g = deform_conv2d_pallas(
        x, offset, mask, weight, None, padding=1, max_offset=r,
        cols_per_block=8, interpret=True, variant="const_hat",
    )
    assert g.shape == ref.shape and bool(jnp.isfinite(g).all())


def test_deform_conv_pallas_lerp_variants_exact():
    """Both bounded-radius fast formulations — "lerp" (sign-selected
    bilinear, the round-3 serving kernel) and "lerp2" (select-free
    narrow-hat restructure, round 4) — match the gather reference at
    1e-4 for |offset| <= 1, on the unpacked AND the batch-pair-packed
    (c == 64) paths."""
    from tauv_vision_tpu.ops.deform_conv import deform_conv2d
    from tauv_vision_tpu.ops.pallas.deform_conv import deform_conv2d_pallas

    rng = np.random.default_rng(8)
    for b, h, w, c, o in ((2, 11, 16, 8, 8), (4, 9, 12, 64, 64)):
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        offset = np.asarray(
            rng.uniform(-1, 1, (b, h, w, 18)).astype(np.float32)
        )
        # Exercise the +-r edges explicitly (the lerp forms switch
        # neighbor sets at 0 and saturate hats at +-1).
        offset[0, 0, 0, :4] = [1.0, -1.0, 0.0, 1.0]
        offset = jnp.asarray(offset)
        mask = jnp.asarray(
            rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32)
        )
        weight = jnp.asarray(
            (rng.standard_normal((3, 3, c, o)) * 0.1).astype(np.float32)
        )
        bias = jnp.asarray(rng.standard_normal(o).astype(np.float32))
        ref = deform_conv2d(
            x, offset, mask, weight, bias, stride=1, padding=1
        )
        for variant in ("lerp", "lerp2"):
            got = deform_conv2d_pallas(
                x, offset, mask, weight, bias, padding=1, max_offset=1,
                cols_per_block=8, interpret=True, variant=variant,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4,
                err_msg=f"variant={variant} c={c}",
            )
        # lerp2 without a modulation mask (the mask fold has a
        # ones-path too).
        ref_nm = deform_conv2d(
            x, offset, None, weight, None, stride=1, padding=1
        )
        got_nm = deform_conv2d_pallas(
            x, offset, None, weight, None, padding=1, max_offset=1,
            cols_per_block=8, interpret=True, variant="lerp2",
        )
        np.testing.assert_allclose(
            np.asarray(got_nm), np.asarray(ref_nm), rtol=1e-4, atol=1e-4,
        )


def test_deform_conv_pallas_fractional_radius():
    """max_offset=0.5 (the bounded-offset serving config) uses a 3x3
    shift window and stays exact for |offset| <= 0.5."""
    from tauv_vision_tpu.ops.deform_conv import deform_conv2d
    from tauv_vision_tpu.ops.pallas.deform_conv import deform_conv2d_pallas

    rng = np.random.default_rng(6)
    b, h, w, c, o = 2, 8, 11, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-0.5, 0.5, (b, h, w, 18)).astype(np.float32)
    )
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32))
    weight = jnp.asarray(
        (rng.standard_normal((3, 3, c, o)) * 0.2).astype(np.float32)
    )
    ref = deform_conv2d(x, offset, mask, weight, None, stride=1, padding=1)
    got = deform_conv2d_pallas(
        x, offset, mask, weight, None, padding=1, max_offset=0.5,
        cols_per_block=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
