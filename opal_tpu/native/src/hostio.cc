// Native host-side IO runtime for opal_tpu.
//
// The reference implements its entire output path natively (Rust +
// CFITSIO: src/grid/yee.rs:749-781 text dumps, src/particle/hgram.rs
// FITS histograms).  The TPU build keeps device compute in XLA but
// routes the host IO hot paths through this library: formatted text
// tables, FITS image encoding (big-endian swap + 2880-byte blocking),
// and weighted histogram binning over multi-million-particle arrays.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the
// image); every entry point returns 0 on success, negative errno-style
// codes on failure.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

namespace {

// Portable big-endian store of an IEEE f64.
inline void store_be64(uint8_t* dst, double v) {
  uint64_t bits;
  std::memcpy(&bits, &v, 8);
  dst[0] = uint8_t(bits >> 56);
  dst[1] = uint8_t(bits >> 48);
  dst[2] = uint8_t(bits >> 40);
  dst[3] = uint8_t(bits >> 32);
  dst[4] = uint8_t(bits >> 24);
  dst[5] = uint8_t(bits >> 16);
  dst[6] = uint8_t(bits >> 8);
  dst[7] = uint8_t(bits);
}

constexpr int64_t kFitsBlock = 2880;

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Text tables ({i}_grid.dat): rows of doubles, space-separated %.17e.
// ---------------------------------------------------------------------------
int opal_write_text_table(const char* path, const double* data,
                          int64_t nrows, int64_t ncols) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  setvbuf(f, nullptr, _IOFBF, 1 << 20);
  // %.17e -> at most 25 chars (sign, digit, '.', 17 digits, e+308)
  char* line = static_cast<char*>(std::malloc(size_t(ncols) * 32 + 2));
  if (!line) {
    std::fclose(f);
    return -2;
  }
  for (int64_t r = 0; r < nrows; ++r) {
    char* p = line;
    const double* row = data + r * ncols;
    for (int64_t c = 0; c < ncols; ++c) {
      if (c) *p++ = ' ';
      p += std::snprintf(p, 32, "%.17e", row[c]);
    }
    *p++ = '\n';
    if (std::fwrite(line, 1, size_t(p - line), f) != size_t(p - line)) {
      std::free(line);
      std::fclose(f);
      return -3;
    }
  }
  std::free(line);
  return std::fclose(f) ? -4 : 0;
}

// ---------------------------------------------------------------------------
// FITS primary-HDU image: the caller supplies the fully formatted
// header (N*80 ASCII cards, END included, not yet padded); this writes
// header padded with spaces to 2880, then the image as big-endian f64
// padded with zeros to 2880.
// ---------------------------------------------------------------------------
int opal_write_fits_image(const char* path, const char* header,
                          int64_t header_len, const double* data,
                          int64_t count) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  setvbuf(f, nullptr, _IOFBF, 1 << 20);

  int rc = 0;
  if (std::fwrite(header, 1, size_t(header_len), f) != size_t(header_len))
    rc = -3;
  int64_t pad = (-header_len % kFitsBlock + kFitsBlock) % kFitsBlock;
  for (int64_t i = 0; i < pad && rc == 0; ++i)
    if (std::fputc(' ', f) == EOF) rc = -3;

  constexpr int64_t kChunk = 4096;
  uint8_t buf[kChunk * 8];
  for (int64_t off = 0; off < count && rc == 0; off += kChunk) {
    int64_t n = count - off < kChunk ? count - off : kChunk;
    for (int64_t i = 0; i < n; ++i) store_be64(buf + i * 8, data[off + i]);
    if (std::fwrite(buf, 8, size_t(n), f) != size_t(n)) rc = -3;
  }
  int64_t dpad = (-(count * 8) % kFitsBlock + kFitsBlock) % kFitsBlock;
  for (int64_t i = 0; i < dpad && rc == 0; ++i)
    if (std::fputc('\0', f) == EOF) rc = -3;

  if (std::fclose(f)) rc = rc ? rc : -4;
  return rc;
}

// ---------------------------------------------------------------------------
// Weighted histogram binning (src/particle/hgram.rs:168-392 core).
//
// values: n doubles already transformed to the binning axis (ln for
// log axes); weights: n doubles.  Entries with non-finite values are
// skipped.  When log_correct != 0 the weight is multiplied by
// bin_sz / (exp(vmin + bin*bin_sz) * expm1(bin_sz)) — the linear
// bin-volume correction of hgram.rs:236-238.  Out-of-range bins are
// dropped.  cts must be zero-initialised by the caller (nbins doubles).
// ---------------------------------------------------------------------------
int opal_hist1d(const double* values, const double* weights, int64_t n,
                double vmin, double bin_sz, int64_t nbins, int log_correct,
                double* cts) {
  if (bin_sz <= 0.0) return -1;
  // divide (not reciprocal-multiply) to match numpy binning exactly
  const double em1 = std::expm1(bin_sz);
  for (int64_t i = 0; i < n; ++i) {
    const double v = values[i];
    if (!std::isfinite(v)) continue;
    const double fb = std::floor((v - vmin) / bin_sz);
    const int64_t b = int64_t(fb);
    if (fb < 0 || b >= nbins) continue;
    double w = weights[i];
    if (log_correct) w *= bin_sz / (std::exp(vmin + double(b) * bin_sz) * em1);
    cts[b] += w;
  }
  return 0;
}

// 2D variant: flat index b1 * nbins0 + b0 (row-major over axis 1).
// Per-axis log corrections applied independently.  sz == 0 collapses
// that axis to bin 0 (degenerate single-bin axis).
int opal_hist2d(const double* v0, const double* v1, const double* weights,
                int64_t n, double min0, double sz0, int64_t nb0,
                int log_correct0, double min1, double sz1, int64_t nb1,
                int log_correct1, double* cts) {
  
  
  const double em10 = std::expm1(sz0);
  const double em11 = std::expm1(sz1);
  for (int64_t i = 0; i < n; ++i) {
    const double a = v0[i], b = v1[i];
    if (!std::isfinite(a) || !std::isfinite(b)) continue;
    int64_t b0 = 0, b1 = 0;
    if (sz0 != 0.0) {
      const double fb = std::floor((a - min0) / sz0);
      if (fb < 0) continue;
      b0 = int64_t(fb);
      if (b0 >= nb0) continue;
    }
    if (sz1 != 0.0) {
      const double fb = std::floor((b - min1) / sz1);
      if (fb < 0) continue;
      b1 = int64_t(fb);
      if (b1 >= nb1) continue;
    }
    double w = weights[i];
    if (log_correct0 && sz0 != 0.0)
      w *= sz0 / (std::exp(min0 + double(b0) * sz0) * em10);
    if (log_correct1 && sz1 != 0.0)
      w *= sz1 / (std::exp(min1 + double(b1) * sz1) * em11);
    cts[b1 * nb0 + b0] += w;
  }
  return 0;
}

// Finite min/max of an array (axis scan before binning); returns the
// number of finite entries, writes min/max (inf/-inf when none).
int64_t opal_finite_minmax(const double* values, int64_t n, double* out_min,
                           double* out_max) {
  double mn = HUGE_VAL, mx = -HUGE_VAL;
  int64_t cnt = 0;
  for (int64_t i = 0; i < n; ++i) {
    const double v = values[i];
    if (!std::isfinite(v)) continue;
    ++cnt;
    if (v < mn) mn = v;
    if (v > mx) mx = v;
  }
  *out_min = mn;
  *out_max = mx;
  return cnt;
}

}  // extern "C"
