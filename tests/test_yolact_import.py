"""Full YOLACT checkpoint import parity: ONE torch reference ``Yolact``
state_dict (backbone + FPN + masknet + shared prediction head,
yolact/model/model.py:18-60) converted via ``load_yolact_state_dict``
must reproduce every output of the torch forward."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


@pytest.mark.slow
def test_yolact_full_import_parity():
    from tauv_vision_tpu.scripts.compare_reference_yolact import (
        _model_kwargs,
        install_yolact_torch_env,
    )

    ref_model_mod = install_yolact_torch_env()
    from tauv_vision.yolact.model.config import ModelConfig as RefModelConfig

    from tauv_vision_tpu.configs import YolactModelConfig
    from tauv_vision_tpu.models.yolact import Yolact, load_yolact_state_dict

    torch.manual_seed(3)
    ref_config = RefModelConfig(
        img_mean=(0.0, 0.0, 0.0), img_stddev=(1.0, 1.0, 1.0),
        **_model_kwargs(),
    )
    ref = ref_model_mod.Yolact(ref_config).eval()
    with torch.no_grad():
        for module in ref.modules():
            if isinstance(module, torch.nn.BatchNorm2d):
                module.running_mean.uniform_(-0.3, 0.3)
                module.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(5).normal(
        size=(2, 3, 64, 64)
    ).astype(np.float32) * 0.5

    with torch.no_grad():
        ref_cls, ref_box, ref_coeff, ref_anchor, ref_proto = ref(
            torch.from_numpy(x)
        )

    variables = load_yolact_state_dict(ref.state_dict())
    model = Yolact(YolactModelConfig(**_model_kwargs()))
    mine = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )
    my_cls, my_box, my_coeff, my_anchor, my_proto = mine.as_tuple()

    np.testing.assert_allclose(
        np.asarray(my_cls), ref_cls.numpy(), atol=2e-3,
        err_msg="classification",
    )
    np.testing.assert_allclose(
        np.asarray(my_box), ref_box.numpy(), atol=2e-3, err_msg="box",
    )
    np.testing.assert_allclose(
        np.asarray(my_coeff), ref_coeff.numpy(), atol=2e-3,
        err_msg="mask_coeff",
    )
    np.testing.assert_allclose(
        np.asarray(my_anchor)[0], ref_anchor[0].numpy(), atol=1e-5,
        err_msg="anchor",
    )
    np.testing.assert_allclose(
        np.asarray(my_proto), ref_proto.numpy(), atol=2e-3,
        err_msg="mask_prototype",
    )

    # Round-trip: exporting the imported tree reproduces the torch
    # state_dict exactly (certifies export_yolact_state_dict, the
    # flax-trained -> torch direction of the transplant harness).
    from tauv_vision_tpu.models.yolact import export_yolact_state_dict

    exported = export_yolact_state_dict(variables)
    ref_sd = {k: v.detach().cpu().numpy() for k, v in
              ref.state_dict().items()}
    assert set(exported) == set(ref_sd), (
        set(exported) ^ set(ref_sd)
    )
    for key, value in ref_sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            exported[key], value.astype(np.float32), err_msg=key
        )
