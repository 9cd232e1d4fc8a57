from tauv_vision_tpu.eval.detection_eval import (
    EvalDetection,
    average_precision,
    center_distance_match,
    detection_iou,
    detections_from_arrays,
    iou_match,
    plot_pr_curve,
    precision_recall,
    precision_recall_curve,
    truths_from_batch,
)

__all__ = [
    "EvalDetection",
    "average_precision",
    "center_distance_match",
    "detection_iou",
    "detections_from_arrays",
    "iou_match",
    "plot_pr_curve",
    "precision_recall",
    "precision_recall_curve",
    "truths_from_batch",
]
