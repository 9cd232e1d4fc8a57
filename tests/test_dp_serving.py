"""Data-parallel serving over a device mesh (batch sharded, params
replicated) — matches the unsharded pipeline exactly."""

from math import pi

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tauv_vision_tpu.configs import (
    AngleConfig,
    CenternetModelConfig,
    ObjectConfig,
    ObjectConfigSet,
)
from tauv_vision_tpu.models.centernet import Centernet
from tauv_vision_tpu.parallel import create_mesh, replicate, shard_batch
from tauv_vision_tpu.serving.pipeline import make_centernet_pipeline


@pytest.mark.slow
def test_dp_pipeline_matches_single_device():
    oc = ObjectConfigSet(
        configs=(
            ObjectConfig(
                id="x",
                yaw=AngleConfig(train=False, modulo=None),
                pitch=AngleConfig(train=False, modulo=None),
                roll=AngleConfig(train=False, modulo=None),
                train_depth=False, train_keypoints=False, keypoints=None,
            ),
        )
    )
    mc = CenternetModelConfig(
        in_h=64, in_w=64, backbone_heights=(1,), backbone_channels=(8, 8),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    model = Centernet(
        object_config=oc, backbone_heights=mc.backbone_heights,
        backbone_channels=mc.backbone_channels, downsamples=mc.downsamples,
        dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (8, 80, 80, 3), dtype=np.uint8)

    single = make_centernet_pipeline(
        model, mc, n_detections=4, score_threshold=0.0, dtype=jnp.float32
    )
    ref = single(variables, jnp.asarray(frames))

    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    sharded_pipeline = make_centernet_pipeline(
        model, mc, n_detections=4, score_threshold=0.0, dtype=jnp.float32,
        mesh=mesh,
    )
    out = sharded_pipeline(
        replicate(variables, mesh), shard_batch(jnp.asarray(frames), mesh)
    )

    np.testing.assert_allclose(
        np.asarray(out.score), np.asarray(ref.score), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out.label), np.asarray(ref.label))
    np.testing.assert_allclose(np.asarray(out.y), np.asarray(ref.y), atol=1e-5)
