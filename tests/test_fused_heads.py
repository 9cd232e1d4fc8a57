"""Fused vs per-head DLASeg head convs.

``fuse_heads=True`` (models/centerpoint_dla.DLASeg) computes every
head's 3x3 conv as one conv with concatenated kernels.  It is
parameter-compatible with the per-head nn.Conv path (same names,
shapes, inits) and bit-identical per output channel; an interleaved
A/B on chip measured it 0.95x (scripts/heads_ab_probe.py), so the
per-head path is the default and the fused path is a kept, tested
option.
"""

from math import pi

import jax
import jax.numpy as jnp
import numpy as np

from tauv_vision_tpu.configs import AngleConfig, ObjectConfig, ObjectConfigSet
from tauv_vision_tpu.models.centerpoint_dla import CenterpointDLA34


def _object_config():
    return ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="a",
                yaw=AngleConfig(train=True, modulo=2 * pi),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=True,
                train_keypoints=False,
                keypoints=None,
            ),
        )
    )


def test_fused_heads_match_per_head():
    oc = _object_config()
    m0 = CenterpointDLA34(object_config=oc, dtype=jnp.float32, deform=False)
    m1 = CenterpointDLA34(
        object_config=oc, dtype=jnp.float32, deform=False, fuse_heads=True
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)

    # both directions: variables initialized by either variant serve both
    v0 = m0.init(jax.random.key(0), img, train=False)
    v1 = m1.init(jax.random.key(0), img, train=False)
    chex_equal = jax.tree_util.tree_structure(v0) == \
        jax.tree_util.tree_structure(v1)
    assert chex_equal, "param trees must be identical"

    p0 = m0.apply(v0, img, train=False)
    p1 = m1.apply(v0, img, train=False)
    for name in ("heatmap", "size", "offset", "yaw_bin", "depth"):
        a, b = getattr(p0, name), getattr(p1, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5,
            err_msg=name,
        )
