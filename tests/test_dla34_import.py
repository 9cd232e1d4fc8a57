"""DLA-34 pretrained-checkpoint import parity: a torch DLA trunk built
from the REFERENCE's own module, its state_dict converted, and our flax
DLATrunk must reproduce all six level outputs."""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

REFERENCE = "/root/reference/src"


@pytest.fixture(scope="module", autouse=True)
def reference_path():
    sys.path.insert(0, REFERENCE)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.DeformConv2d = object
        tv.ops = ops
        tr = types.ModuleType("torchvision.transforms")
        v2 = types.ModuleType("torchvision.transforms.v2")
        for name in ("ToImageTensor", "ConvertImageDtype", "Compose",
                     "ToTensor", "Resize", "Normalize"):
            setattr(v2, name, lambda *a, **k: None)
        tr.v2 = v2
        tv.transforms = tr
        models = types.ModuleType("torchvision.models")
        tv.models = models
        sys.modules.update(
            {
                "torchvision": tv,
                "torchvision.ops": ops,
                "torchvision.transforms": tr,
                "torchvision.transforms.v2": v2,
                "torchvision.models": models,
            }
        )
    if "spatialmath" not in sys.modules:
        sm = types.ModuleType("spatialmath")
        sm.SE3 = object
        sm.SO3 = object
        sys.modules["spatialmath"] = sm
    yield
    sys.path.remove(REFERENCE)


@pytest.mark.slow
def test_dla34_trunk_import_parity():
    from tauv_vision.centernet.model.backbones.centerpoint_dla import (
        DLA,
        BasicBlock,
    )

    from tauv_vision_tpu.models.centerpoint_dla import (
        DLATrunk,
        load_dla34_state_dict,
    )

    torch.manual_seed(0)
    ref = DLA([1, 1, 1, 2, 2, 1], [16, 32, 64, 128, 256, 512],
              block=BasicBlock).eval()
    # Randomize BN running stats so the import is actually exercised.
    with torch.no_grad():
        for module in ref.modules():
            if isinstance(module, torch.nn.BatchNorm2d):
                module.running_mean.uniform_(-0.3, 0.3)
                module.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(0).normal(size=(1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref_levels = [t.numpy() for t in ref(torch.from_numpy(x))]

    variables = load_dla34_state_dict(ref.state_dict())
    trunk = DLATrunk()
    mine = trunk.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )

    assert len(mine) == 6
    for level_i, (got, want) in enumerate(zip(mine, ref_levels)):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        assert got.shape == want.shape, level_i
        np.testing.assert_allclose(
            got, want, atol=5e-3,
            err_msg=f"level {level_i}",
        )
