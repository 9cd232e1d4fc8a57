from tauv_vision_tpu.configs.centernet import (
    AngleConfig,
    CenternetModelConfig,
    CenternetTrainConfig,
    ObjectConfig,
    ObjectConfigSet,
    get_head_channels,
)
from tauv_vision_tpu.configs.yolact import (
    ClassConfig,
    ClassConfigSet,
    YolactModelConfig,
    YolactTrainConfig,
)
from tauv_vision_tpu.configs.yolo_pose import YoloPoseModelConfig

__all__ = [
    "AngleConfig",
    "CenternetModelConfig",
    "CenternetTrainConfig",
    "ObjectConfig",
    "ObjectConfigSet",
    "get_head_channels",
    "ClassConfig",
    "ClassConfigSet",
    "YolactModelConfig",
    "YolactTrainConfig",
    "YoloPoseModelConfig",
]
