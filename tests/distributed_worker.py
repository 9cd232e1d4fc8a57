"""Worker process for the two-process jax.distributed smoke test
(tests/test_distributed.py::test_two_process_dp_step).

Each process initializes the coordinator through
tauv_vision_tpu.parallel.distributed.initialize (the module under
test), builds the global DP mesh, feeds its host-local slice of a
deterministic global batch via host_local_batch_slice +
make_array_from_process_local_data, runs ONE centernet train step, and
process 0 prints the loss.  The parent asserts it equals the
single-process loss on the same global batch.

Launched as:
  python tests/distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tauv_vision_tpu.parallel import distributed

    if num_processes > 1:
        assert distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=num_processes,
            process_id=process_id,
        )
    assert distributed.process_count() == num_processes

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    from math import pi

    from tauv_vision_tpu.configs import (
        AngleConfig,
        CenternetModelConfig,
        CenternetTrainConfig,
        ObjectConfig,
        ObjectConfigSet,
    )
    from tauv_vision_tpu.data.synthetic import (
        SquareDatasetConfig,
        generate_square_batch,
    )
    from tauv_vision_tpu.models.centernet import Centernet
    from tauv_vision_tpu.parallel.mesh import create_mesh
    from tauv_vision_tpu.train import (
        TrainState,
        adam_with_clip,
        make_centernet_train_step,
    )

    object_config = ObjectConfigSet(configs=(
        ObjectConfig(
            id="square",
            yaw=AngleConfig(train=False, modulo=2 * pi),
            pitch=AngleConfig(train=False, modulo=2 * pi),
            roll=AngleConfig(train=False, modulo=2 * pi),
            train_depth=False, train_keypoints=False, keypoints=None,
        ),
    ))
    model_config = CenternetModelConfig(
        in_h=32, in_w=32, backbone_heights=(1,), backbone_channels=(8, 8),
        downsamples=2, angle_bin_overlap=pi / 3,
    )
    train_config = CenternetTrainConfig(
        lr=1e-3, batch_size=4, n_batches=1, n_epochs=1,
        heatmap_focal_loss_a=2.0, heatmap_focal_loss_b=4.0,
        heatmap_sigma_factor=0.1, keypoint_heatmap_sigma=1.0,
        keypoint_affinity_sigma=1.0, loss_lambda_keypoint_heatmap=1.0,
        loss_lambda_keypoint_affinity=1.0, loss_lambda_size=0.1,
        loss_lambda_offset=1.0, loss_lambda_angle=1.0,
        loss_lambda_depth=1.0, max_objects=2, max_keypoints=2,
    )

    model = Centernet(
        object_config=object_config, backbone_heights=(1,),
        backbone_channels=(8, 8), downsamples=2,
    )

    # Deterministic global batch, identical in every process.
    rng = np.random.default_rng(123)
    cfg = SquareDatasetConfig(in_h=32, in_w=32, max_objects=2, min_side=6,
                              max_side=12, rotate=False)
    img, truth = generate_square_batch(rng, 4, cfg)

    mesh = create_mesh()  # 1-D DP mesh over the global devices
    data_sharding = NamedSharding(mesh, PartitionSpec("data"))
    rep = NamedSharding(mesh, PartitionSpec())

    sl = distributed.host_local_batch_slice(img.shape[0])

    def to_global(x):
        return jax.make_array_from_process_local_data(
            data_sharding, np.asarray(x)[sl]
        )

    img_g = to_global(img)
    truth_g = jax.tree_util.tree_map(to_global, truth)

    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 32, 32, 3)), train=False),
        out_shardings=rep,
    )(jax.random.key(0))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=adam_with_clip(1e-3, 1.0),
    )
    step_fn = make_centernet_train_step(
        model, model_config, train_config, object_config, mesh=mesh
    )
    state, losses = step_fn(state, img_g, truth_g)
    total = float(losses.total)
    if process_id == 0:
        print(f"DIST_LOSS {total:.6f}", flush=True)


if __name__ == "__main__":
    main()
