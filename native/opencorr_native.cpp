// Native I/O runtime for opencorr_tpu.
//
// The reference's L5 layer (oc_io.cpp) is C++ iostream-based CSV/binary I/O;
// this library is its TPU-framework counterpart: a fast fixed-point CSV table
// codec (the hot path when persisting 10^4..10^6-POI result tables) exposed
// through a minimal C ABI consumed via ctypes (opencorr_tpu/io/native.py).
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC, no external deps)

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Format one float as fixed 8-decimals, mirroring std::ofstream with
// setf(std::ios::fixed) << setprecision(8) used by the reference
// (oc_io.cpp:320-322).
inline char* format_fixed8(char* p, float v) {
  auto res = std::to_chars(p, p + 64, static_cast<double>(v),
                           std::chars_format::fixed, 8);
  return res.ptr;
}

}  // namespace

extern "C" {

// Write a CSV table: header line (caller-built, no trailing newline needed)
// plus n_rows rows of n_cols floats, each cell followed by the delimiter
// (matching the reference's trailing-delimiter rows). Returns 0 on success.
int oc_write_table(const char* path, const char* header, const float* data,
                   int64_t n_rows, int64_t n_cols, char delimiter) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;

  std::string head(header);
  head.push_back('\n');
  if (std::fwrite(head.data(), 1, head.size(), f) != head.size()) {
    std::fclose(f);
    return -2;
  }

  // Chunked buffer: 72 bytes per cell covers to_chars fixed/8-decimals even
  // for near-FLT_MAX magnitudes (~48 chars) with margin, plus delimiter.
  const size_t kChunkRows = 4096;
  std::vector<char> buf(kChunkRows * (static_cast<size_t>(n_cols) * 72 + 2));
  for (int64_t r0 = 0; r0 < n_rows; r0 += kChunkRows) {
    int64_t r1 = std::min<int64_t>(r0 + kChunkRows, n_rows);
    char* p = buf.data();
    for (int64_t r = r0; r < r1; ++r) {
      const float* row = data + r * n_cols;
      for (int64_t c = 0; c < n_cols; ++c) {
        p = format_fixed8(p, row[c]);
        *p++ = delimiter;
      }
      *p++ = '\n';
    }
    size_t len = static_cast<size_t>(p - buf.data());
    if (std::fwrite(buf.data(), 1, len, f) != len) {
      std::fclose(f);
      return -3;
    }
  }
  std::fclose(f);
  return 0;
}

// Parse a delimited numeric CSV (optionally skipping a header line) into a
// dense float buffer. Returns the number of rows parsed, or <0 on error.
// n_cols_out receives the column count of the first data row; rows with
// fewer/extra trailing delimiters are tolerated (missing cells are 0).
int64_t oc_read_table(const char* path, int skip_header, float* out,
                      int64_t max_rows, int64_t max_cols, char delimiter,
                      int64_t* n_cols_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> text(static_cast<size_t>(size) + 1);
  if (std::fread(text.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  text[size] = '\0';

  char* p = text.data();
  char* end = text.data() + size;
  if (skip_header) {
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }

  int64_t rows = 0;
  int64_t ncols_first = -1;
  while (p < end && rows < max_rows) {
    // one line
    char* line_end = static_cast<char*>(std::memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    if (line_end == p) {  // empty line
      ++p;
      continue;
    }
    float* row = out + rows * max_cols;
    int64_t c = 0;
    char* q = p;
    while (q < line_end && c < max_cols) {
      char* cell_end = q;
      while (cell_end < line_end && *cell_end != delimiter) ++cell_end;
      if (cell_end > q) {
        row[c] = std::strtof(q, nullptr);
        ++c;
      }
      q = cell_end + 1;
    }
    if (ncols_first < 0) ncols_first = c;
    ++rows;
    p = line_end + 1;
  }
  *n_cols_out = ncols_first;
  return rows;
}

// Raw volume .bin writer (oc_image.cpp:76-110 layout): int32[3] dims header
// then float payload.
int oc_write_volume_bin(const char* path, const float* data, int32_t dim_x,
                        int32_t dim_y, int32_t dim_z) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int32_t dims[3] = {dim_x, dim_y, dim_z};
  size_t n = static_cast<size_t>(dim_x) * dim_y * dim_z;
  bool ok = std::fwrite(dims, sizeof(int32_t), 3, f) == 3 &&
            std::fwrite(data, sizeof(float), n, f) == n;
  std::fclose(f);
  return ok ? 0 : -2;
}

}  // extern "C"
