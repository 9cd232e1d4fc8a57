"""Native C++ RLE codec tests (build + cross-compat with the Python
implementation)."""

import numpy as np
import pytest

from tauv_vision_tpu import native
from tauv_vision_tpu.data import label_studio


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_roundtrip(lib):
    rng = np.random.default_rng(0)
    # Mix of long runs and noise — exercises both block kinds.
    values = np.concatenate(
        [
            np.zeros(5000, np.uint8),
            rng.integers(0, 255, 300, dtype=np.uint8),
            np.full(70000, 255, np.uint8),  # run longer than 16-bit max
            rng.integers(0, 255, 7, dtype=np.uint8),
        ]
    )
    encoded = native.brush_rle_encode(values)
    assert encoded is not None
    decoded = native.brush_rle_decode(encoded, len(values))
    np.testing.assert_array_equal(decoded, values)
    # Compression actually happened on the runny input.
    assert len(encoded) < len(values) / 2


def test_native_decodes_python_encoding(lib):
    rng = np.random.default_rng(1)
    values = rng.integers(0, 255, 2048, dtype=np.uint8)
    py_encoded = label_studio.encode_brush_rle(values)
    decoded = native.brush_rle_decode(py_encoded, len(values))
    np.testing.assert_array_equal(decoded, values)


def test_python_decodes_native_encoding(lib):
    rng = np.random.default_rng(2)
    values = np.concatenate(
        [np.full(1000, 7, np.uint8), rng.integers(0, 255, 100, dtype=np.uint8)]
    )
    encoded = native.brush_rle_encode(values)
    # Force the pure-Python path by feeding the fallback reader directly.
    reader = label_studio._BitReader(bytes(bytearray(encoded)))
    num = reader.read(32)
    assert num == len(values)
    word_size = reader.read(5) + 1
    assert word_size == 8
    rle_sizes = [reader.read(4) + 1 for _ in range(4)]
    out = np.zeros(num, np.uint8)
    i = 0
    while i < num:
        is_run = reader.read(1)
        j = i + 1 + reader.read(rle_sizes[reader.read(2)])
        if is_run:
            out[i:j] = reader.read(word_size)
            i = j
        else:
            while i < j:
                out[i] = reader.read(word_size)
                i += 1
    np.testing.assert_array_equal(out, values)


def test_label_studio_uses_native_transparently(lib):
    rng = np.random.default_rng(3)
    mask = (rng.uniform(size=(32, 40)) > 0.5).astype(np.uint8) * 255
    rgba = np.zeros((32, 40, 4), np.uint8)
    rgba[..., 3] = mask
    rle = label_studio.encode_brush_rle(rgba.ravel())
    decoded = label_studio.decode_brush_rle(rle).reshape(32, 40, 4)
    np.testing.assert_array_equal(decoded, rgba)


def test_native_rejects_truncated_stream(lib):
    values = np.full(100, 3, np.uint8)
    encoded = native.brush_rle_encode(values)
    truncated = encoded[: len(encoded) // 2]
    assert native.brush_rle_decode(truncated, 100) is None
