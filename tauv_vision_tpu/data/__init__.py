from tauv_vision_tpu.data import augment, dataset_dir, loader, synthetic  # noqa: F401
from tauv_vision_tpu.data.dataset_dir import Split  # noqa: F401
