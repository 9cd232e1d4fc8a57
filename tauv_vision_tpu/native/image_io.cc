// Native PNG decode/encode for the host data path.
//
// The training loader's per-sample cost is dominated by PNG decode
// (dataset_dir.read_sample); this uses libpng's simplified API and is
// called through ctypes, which releases the GIL — so a Python thread
// pool scales decode across cores on many-core training hosts.  Every
// caller has a PIL fallback (data/image_io.py).

#include <cstdint>
#include <cstring>

#include <png.h>

extern "C" {

// Probe dimensions.  Returns 0 on success.
int32_t tauv_png_probe(const uint8_t* buf, int64_t len, int32_t* w,
                       int32_t* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, (size_t)len)) {
    return -1;
  }
  *w = (int32_t)image.width;
  *h = (int32_t)image.height;
  png_image_free(&image);
  return 0;
}

// Decode to 8-bit with `channels` in {1, 3, 4} (gray / RGB / RGBA —
// libpng converts palette, 16-bit, and gray+alpha variants).  `out`
// must hold w*h*channels bytes.  Returns 0 on success.
int32_t tauv_png_decode(const uint8_t* buf, int64_t len, int32_t channels,
                        uint8_t* out, int64_t out_cap) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, (size_t)len)) {
    return -1;
  }
  if (channels == 1 &&
      (image.format & (PNG_FORMAT_FLAG_COLOR | PNG_FORMAT_FLAG_COLORMAP |
                       PNG_FORMAT_FLAG_LINEAR))) {
    // Grayscale requested from a color/palette/16-bit source: PIL
    // semantics for such files (raw palette indices for 'P' mode, raw
    // uint16 values for 'I;16') differ from libpng's colorimetric /
    // 8-bit conversion — let the caller fall back.
    png_image_free(&image);
    return -5;
  }
  switch (channels) {
    case 1: image.format = PNG_FORMAT_GRAY; break;
    case 3: image.format = PNG_FORMAT_RGB; break;
    case 4: image.format = PNG_FORMAT_RGBA; break;
    default:
      png_image_free(&image);
      return -2;
  }
  const int64_t need = (int64_t)PNG_IMAGE_SIZE(image);
  if (need > out_cap) {
    png_image_free(&image);
    return -3;
  }
  if (!png_image_finish_read(&image, /*background=*/nullptr, out,
                             /*row_stride=*/0, /*colormap=*/nullptr)) {
    png_image_free(&image);
    return -4;
  }
  return 0;
}

// Encode an 8-bit HWC image (channels in {1, 3, 4}).  Returns bytes
// written, or -1 on failure / insufficient out_cap.
int64_t tauv_png_encode(const uint8_t* img, int32_t h, int32_t w,
                        int32_t channels, uint8_t* out, int64_t out_cap) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  image.width = (png_uint_32)w;
  image.height = (png_uint_32)h;
  switch (channels) {
    case 1: image.format = PNG_FORMAT_GRAY; break;
    case 3: image.format = PNG_FORMAT_RGB; break;
    case 4: image.format = PNG_FORMAT_RGBA; break;
    default: return -1;
  }
  png_alloc_size_t size = (png_alloc_size_t)out_cap;
  if (!png_image_write_to_memory(&image, out, &size, /*convert_to_8bit=*/0,
                                 img, /*row_stride=*/0,
                                 /*colormap=*/nullptr)) {
    return -1;
  }
  return (int64_t)size;
}

}  // extern "C"
