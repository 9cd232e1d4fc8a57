"""Batch-group channel packing for the DLA-34 early trunk.

``early_pack=G`` (models/centerpoint_dla.DLATrunk) computes the
MXU-starved stem/level0/level1 convs on G images packed into the
channel dimension via block-diagonal kernels.  The parameters are
untouched (same names/shapes as the unpacked nn.Conv/nn.BatchNorm
modules), so one variables dict must serve both paths and the packed
forward must be numerically the unpacked forward.
"""

from math import pi

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@contextlib.contextmanager
def _x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)

from tauv_vision_tpu.configs import AngleConfig, ObjectConfig, ObjectConfigSet
from tauv_vision_tpu.models.centerpoint_dla import (
    CenterpointDLA34,
    DLATrunk,
    _block_diag_kernel,
    _pack_batch,
    _unpack_batch,
)


def _object_config():
    return ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="a",
                yaw=AngleConfig(train=False, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=2 * pi),
                roll=AngleConfig(train=False, modulo=2 * pi),
                train_depth=False,
                train_keypoints=False,
                keypoints=None,
            ),
        )
    )


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 6, 10, 3)), jnp.float32)
    assert jnp.array_equal(_unpack_batch(_pack_batch(x, 4), 4), x)


def test_block_diag_kernel_structure():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(3, 3, 2, 5)), jnp.float32)
    kp = _block_diag_kernel(k, 3)
    assert kp.shape == (3, 3, 6, 15)
    kp = np.asarray(kp)
    for g in range(3):
        block = kp[:, :, 2 * g : 2 * (g + 1), 5 * g : 5 * (g + 1)]
        np.testing.assert_array_equal(block, np.asarray(k))
    # off-diagonal blocks are structural zeros
    assert np.abs(kp).sum() == pytest.approx(3 * np.abs(np.asarray(k)).sum())


@pytest.mark.slow
def test_packed_trunk_matches_unpacked_f64():
    """Same variables, packed vs unpacked DLATrunk: equal outputs.

    Run at f64 so conv accumulation-order noise is negligible and the
    only remaining difference is the f32 rounding the BatchNorm dtype
    applies between levels (~2 f32 ulps; measured level-by-level).  At
    f32, XLA CPU picks different conv algorithms for C=16 vs packed
    C=64 and the reassociation gap amplifies through the random
    untrained trees — the serving-precision certification is the
    decoded-delta measurement on the trained model
    (scripts/quantize_accuracy_check --early-pack)."""
    rng = np.random.default_rng(1)
    with _x64():
        img = jnp.asarray(rng.normal(size=(8, 32, 48, 3)), jnp.float64)
        trunk0 = DLATrunk(dtype=jnp.float64)
        trunk4 = DLATrunk(dtype=jnp.float64, early_pack=4)
        variables = trunk0.init(jax.random.key(0), img[:1], train=False)
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float64), variables
        )
        out0 = trunk0.apply(variables, img, train=False)
        out4 = trunk4.apply(variables, img, train=False)
        assert len(out0) == len(out4) == 6
        for a, b in zip(out0, out4):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-6
            )


def test_packed_trunk_falls_back_when_batch_indivisible():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(3, 32, 48, 3)), jnp.float32)
    trunk4 = DLATrunk(dtype=jnp.float32, early_pack=4)
    variables = trunk4.init(jax.random.key(0), img[:1], train=False)
    out = trunk4.apply(variables, img, train=False)
    assert out[0].shape[0] == 3


@pytest.mark.slow
def test_packed_full_model_matches_unpacked():
    """CenterpointDLA34 with early_pack=4 accepts the variables the
    unpacked model initialized and produces equivalent outputs (f64;
    tolerance covers the f32 BN rounding between levels)."""
    oc = _object_config()
    rng = np.random.default_rng(3)
    with _x64():
        m0 = CenterpointDLA34(
            object_config=oc, dtype=jnp.float64, deform=False
        )
        m4 = CenterpointDLA34(
            object_config=oc, dtype=jnp.float64, deform=False, early_pack=4
        )
        img = jnp.asarray(rng.normal(size=(4, 64, 96, 3)), jnp.float64)
        variables = m0.init(jax.random.key(0), img[:1], train=False)
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float64), variables
        )
        p0 = m0.apply(variables, img, train=False)
        p4 = m4.apply(variables, img, train=False)
        for a, b in (
            (p0.heatmap, p4.heatmap),
            (p0.size, p4.size),
            (p0.offset, p4.offset),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-6
            )
