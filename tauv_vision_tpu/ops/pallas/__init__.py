from tauv_vision_tpu.ops.pallas.mask_assembly import assemble_mask_pallas
from tauv_vision_tpu.ops.pallas.peak_decode import peak_decode_pallas

__all__ = ["assemble_mask_pallas", "peak_decode_pallas"]
