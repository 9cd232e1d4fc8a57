from tauv_vision_tpu.train.centernet_task import (
    CenternetLosses,
    CenternetTruth,
    centernet_loss,
)
from tauv_vision_tpu.train.state import TrainState, adam_with_clip, warmup_adam
from tauv_vision_tpu.train.steps import (
    make_centernet_eval_step,
    make_centernet_train_step,
    make_yolact_eval_step,
    make_yolact_train_step,
)
from tauv_vision_tpu.train.yolact_task import YolactLosses, YolactTruth, yolact_loss

__all__ = [
    "CenternetLosses",
    "CenternetTruth",
    "centernet_loss",
    "TrainState",
    "adam_with_clip",
    "warmup_adam",
    "make_centernet_eval_step",
    "make_centernet_train_step",
    "make_yolact_eval_step",
    "make_yolact_train_step",
    "YolactLosses",
    "YolactTruth",
    "yolact_loss",
]
