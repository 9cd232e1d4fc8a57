from tauv_vision_tpu.serving.centernet_decode import (
    Detections,
    KeypointDetections,
    decode,
    decode_keypoints,
)
from tauv_vision_tpu.serving.pipeline import (
    back_project,
    depth_window_z,
    make_centernet_keypoint_pipeline,
    make_centernet_pipeline,
    make_yolact_pipeline,
    mask_mean_z,
)
from tauv_vision_tpu.serving.yolact_decode import YolactDetections, decode_yolact

__all__ = [
    "Detections",
    "KeypointDetections",
    "decode",
    "decode_keypoints",
    "back_project",
    "depth_window_z",
    "make_centernet_keypoint_pipeline",
    "make_centernet_pipeline",
    "make_yolact_pipeline",
    "mask_mean_z",
    "YolactDetections",
    "decode_yolact",
]
