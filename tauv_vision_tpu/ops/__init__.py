from tauv_vision_tpu.ops import (  # noqa: F401
    anchors,
    angles,
    boxes,
    depth,
    heatmap,
    image,
    losses,
    masks,
    nms,
    peaks,
)
