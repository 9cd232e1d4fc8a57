"""Native PNG codec (native/image_io.cc via data/image_io.py) vs PIL.

The native path must be byte-exact with PIL on every format the dataset
layer produces; anything it can't handle must fall back (return the
same values through PIL)."""

import io
import pathlib

import numpy as np
import pytest
from PIL import Image

from tauv_vision_tpu import native
from tauv_vision_tpu.data.image_io import read_image, write_png


def _pil_bytes(img: Image.Image) -> bytes:
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_native_codec_builds():
    assert native.load() is not None
    assert hasattr(native.load(), "tauv_png_decode")


def test_decode_rgb_matches_pil():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (33, 47, 3), np.uint8)
    data = _pil_bytes(Image.fromarray(arr))
    out = native.png_decode(data, 3)
    assert out is not None
    np.testing.assert_array_equal(out, arr)


def test_decode_gray_matches_pil():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (21, 17), np.uint8)
    data = _pil_bytes(Image.fromarray(arr))
    out = native.png_decode(data, 1)
    assert out is not None
    np.testing.assert_array_equal(out, arr)


def test_decode_rgba_matches_pil():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (9, 13, 4), np.uint8)
    data = _pil_bytes(Image.fromarray(arr, "RGBA"))
    out = native.png_decode(data, 4)
    assert out is not None
    np.testing.assert_array_equal(out, arr)


def test_gray_request_from_palette_falls_back():
    """Palette sources must NOT be colorimetrically converted: the
    native path declines and read_image returns PIL's raw indices."""
    arr = np.array([[0, 1], [2, 1]], np.uint8)
    img = Image.fromarray(arr, "P")
    img.putpalette([0, 0, 0, 255, 0, 0, 0, 255, 0] + [0] * 759)
    data = _pil_bytes(img)
    assert native.png_decode(data, 1) is None  # guarded in C


def test_encode_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    for shape in ((15, 11, 3), (8, 9), (6, 5, 4)):
        arr = rng.integers(0, 256, shape, np.uint8)
        data = native.png_encode(arr)
        assert data is not None
        back = np.asarray(Image.open(io.BytesIO(data)))
        np.testing.assert_array_equal(back, arr)


def test_read_write_image_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (12, 18, 3), np.uint8)
    p = tmp_path / "x.png"
    write_png(p, arr)
    np.testing.assert_array_equal(read_image(p, channels=3), arr)

    seg = rng.integers(0, 7, (12, 18), np.uint8)
    ps = tmp_path / "seg.png"
    write_png(ps, seg)
    np.testing.assert_array_equal(read_image(ps, channels=1), seg)


def test_read_image_non_png_falls_back(tmp_path):
    arr = np.full((4, 4, 3), 9, np.uint8)
    p = tmp_path / "x.bmp"
    Image.fromarray(arr).save(p, format="BMP")
    np.testing.assert_array_equal(read_image(p, channels=3), arr)
