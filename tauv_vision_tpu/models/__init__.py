from tauv_vision_tpu.models.centernet import Centernet, Prediction
from tauv_vision_tpu.models.dla import DLABackbone
from tauv_vision_tpu.models.resnet import Resnet18Features
from tauv_vision_tpu.models.yolact import Yolact, YolactPrediction

__all__ = [
    "Centernet",
    "Prediction",
    "DLABackbone",
    "Resnet18Features",
    "Yolact",
    "YolactPrediction",
]
