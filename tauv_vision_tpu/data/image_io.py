"""Host image IO: native C++ PNG codec with a PIL fallback.

The training loader's per-sample host cost is dominated by PNG decode;
``native/image_io.cc`` (libpng simplified API, ctypes) decodes without
the GIL so ``data/loader.py``'s prefetch threads and grain worker
processes scale it across cores.  Any failure — no compiler, no libpng,
non-PNG file — falls back to PIL transparently.
"""

from __future__ import annotations

import pathlib
from typing import Optional, Union

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def read_image(
    path: Union[str, pathlib.Path], channels: Optional[int] = 3
) -> np.ndarray:
    """Read an image file to uint8.

    channels=3 -> [H, W, 3] RGB; channels=4 -> [H, W, 4] RGBA.
    channels=1 -> the file's RAW single-channel values [H, W] (the
    segmentation-map contract: grayscale bytes or palette INDICES —
    never a colorimetric conversion; color files come back [H, W, C]
    for the caller to slice).  channels=None -> the file's own layout.
    """
    data = pathlib.Path(path).read_bytes()
    if channels in (1, 3, 4) and data[:8] == _PNG_MAGIC:
        from tauv_vision_tpu import native

        # For channels=1 the native codec only accepts true-grayscale
        # sources (palette/color return None -> PIL below).
        out = native.png_decode(data, channels)
        if out is not None:
            return out

    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data))
    if channels == 3:
        img = img.convert("RGB")
    elif channels == 4:
        img = img.convert("RGBA")
    return np.asarray(img)


def write_png(path: Union[str, pathlib.Path], img: np.ndarray) -> None:
    """Write an 8-bit [H, W] / [H, W, C] array as PNG."""
    from tauv_vision_tpu import native

    data = native.png_encode(img)
    if data is not None:
        pathlib.Path(path).write_bytes(data)
        return

    from PIL import Image

    Image.fromarray(np.asarray(img, np.uint8)).save(path)
