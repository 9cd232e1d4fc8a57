// Label Studio brush-RLE codec, native implementation.
//
// The Python decoder (data/label_studio.py) walks the bitstream one bit
// at a time in interpreted code; annotation conversion over thousands of
// full-resolution masks is host-bound on it.  This translation unit
// exposes a C ABI consumed via ctypes (no pybind11 in this image).
//
// Format (matching the Label Studio converter): 32-bit element count,
// 5-bit (word_size - 1), four 4-bit (run_size - 1) entries, then tagged
// blocks: 1 bit {1 = run, 0 = verbatim}, 2-bit run-size selector,
// run_size bits (length - 1), then either one word (run) or `length`
// words (verbatim).  All fields MSB-first.

#include <cstdint>
#include <cstring>

namespace {

class BitReader {
 public:
  BitReader(const uint8_t* data, int64_t n_bytes)
      : data_(data), n_bits_(n_bytes * 8), pos_(0) {}

  // Read up to 32 bits MSB-first; returns 0 past the end.
  uint32_t Read(int n) {
    uint32_t value = 0;
    for (int i = 0; i < n; ++i) {
      value <<= 1;
      if (pos_ < n_bits_) {
        value |= (data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
      }
      ++pos_;
    }
    return value;
  }

  bool Ok() const { return pos_ <= n_bits_; }

 private:
  const uint8_t* data_;
  int64_t n_bits_;
  int64_t pos_;
};

class BitWriter {
 public:
  BitWriter(uint8_t* out, int64_t capacity)
      : out_(out), capacity_bits_(capacity * 8), pos_(0) {
    std::memset(out, 0, capacity);
  }

  void Write(uint32_t value, int n) {
    for (int i = n - 1; i >= 0; --i) {
      if (pos_ < capacity_bits_) {
        if ((value >> i) & 1) {
          out_[pos_ >> 3] |= static_cast<uint8_t>(1u << (7 - (pos_ & 7)));
        }
      }
      ++pos_;
    }
  }

  int64_t BytesWritten() const { return (pos_ + 7) / 8; }
  bool Ok() const { return pos_ <= capacity_bits_; }

 private:
  uint8_t* out_;
  int64_t capacity_bits_;
  int64_t pos_;
};

}  // namespace

extern "C" {

// Decode `rle` (n_bytes) into `out` (capacity out_capacity bytes).
// Returns the number of elements decoded, or -1 on error/overflow.
int64_t brush_rle_decode(const uint8_t* rle, int64_t n_bytes, uint8_t* out,
                         int64_t out_capacity) {
  BitReader reader(rle, n_bytes);
  const int64_t num = reader.Read(32);
  if (num < 0 || num > out_capacity) return -1;
  const int word_size = static_cast<int>(reader.Read(5)) + 1;
  int run_sizes[4];
  for (int i = 0; i < 4; ++i) {
    run_sizes[i] = static_cast<int>(reader.Read(4)) + 1;
  }

  int64_t i = 0;
  while (i < num) {
    const uint32_t is_run = reader.Read(1);
    const int selector = static_cast<int>(reader.Read(2));
    const int64_t length = 1 + reader.Read(run_sizes[selector]);
    const int64_t j = i + length;
    if (j > num || !reader.Ok()) return -1;
    if (is_run) {
      const uint8_t value = static_cast<uint8_t>(reader.Read(word_size));
      std::memset(out + i, value, static_cast<size_t>(j - i));
      i = j;
    } else {
      for (; i < j; ++i) {
        out[i] = static_cast<uint8_t>(reader.Read(word_size));
      }
    }
  }
  return num;
}

// Encode `values` (n elements) with 8-bit words and run-length
// compression of repeated values (run sizes fixed at 16 bits).
// Returns bytes written, or -1 if `out_capacity` is too small.
int64_t brush_rle_encode(const uint8_t* values, int64_t n, uint8_t* out,
                         int64_t out_capacity) {
  BitWriter writer(out, out_capacity);
  writer.Write(static_cast<uint32_t>(n), 32);
  writer.Write(8 - 1, 5);
  for (int i = 0; i < 4; ++i) writer.Write(16 - 1, 4);

  int64_t i = 0;
  while (i < n) {
    // Measure the run of identical values at i.
    int64_t run = 1;
    while (i + run < n && values[i + run] == values[i] && run < 65536) {
      ++run;
    }
    if (run >= 4) {
      writer.Write(1, 1);
      writer.Write(0, 2);
      writer.Write(static_cast<uint32_t>(run - 1), 16);
      writer.Write(values[i], 8);
      i += run;
    } else {
      // Verbatim block: extend until the next long run or cap.
      int64_t j = i;
      while (j < n && (j - i) < 65536) {
        int64_t ahead = 1;
        while (j + ahead < n && values[j + ahead] == values[j] && ahead < 4) {
          ++ahead;
        }
        if (ahead >= 4 && j > i) break;
        j += 1;
      }
      writer.Write(0, 1);
      writer.Write(0, 2);
      writer.Write(static_cast<uint32_t>(j - i - 1), 16);
      for (int64_t k = i; k < j; ++k) writer.Write(values[k], 8);
      i = j;
    }
    if (!writer.Ok()) return -1;
  }
  return writer.BytesWritten();
}

}  // extern "C"
