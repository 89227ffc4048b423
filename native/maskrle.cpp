// COCO run-length-encoded mask codec.
//
// Native replacement for the reference's Cython/C extension
// (reference: tools/refer/external/maskApi.c, built by tools/refer/setup.py).
// Exposed through ctypes (volta_tpu/tools/_mask.py); masks are
// Fortran-order uint8 buffers [h, w] like pycocotools.
//
// Build: g++ -O2 -shared -fPIC maskrle.cpp -o libmaskrle.so

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <algorithm>
#include <vector>

extern "C" {

// Decode counts[0..m) (alternating 0s/1s runs, column-major) into mask.
void rle_decode(const uint32_t* counts, int64_t m, uint8_t* mask,
                int64_t n_pixels) {
  int64_t pos = 0;
  uint8_t value = 0;
  for (int64_t i = 0; i < m && pos < n_pixels; ++i) {
    int64_t run = counts[i];
    if (run > n_pixels - pos) run = n_pixels - pos;
    memset(mask + pos, value, run);
    pos += run;
    value = 1 - value;
  }
}

// Encode a column-major mask into counts; returns the run count.
int64_t rle_encode(const uint8_t* mask, int64_t n_pixels, uint32_t* counts,
                   int64_t max_counts) {
  int64_t m = 0;
  uint8_t value = 0;
  uint32_t run = 0;
  for (int64_t i = 0; i < n_pixels; ++i) {
    if (mask[i] != value) {
      if (m >= max_counts) return -1;
      counts[m++] = run;
      run = 0;
      value = 1 - value;
    }
    ++run;
  }
  if (m >= max_counts) return -1;
  counts[m++] = run;
  return m;
}

uint64_t rle_area(const uint32_t* counts, int64_t m) {
  uint64_t a = 0;
  for (int64_t i = 1; i < m; i += 2) a += counts[i];
  return a;
}

// Bounding box [x, y, w, h] of a column-major RLE over an h-row image.
void rle_to_bbox(const uint32_t* counts, int64_t m, int64_t h,
                 double* bbox) {
  int64_t xs = INT64_MAX, ys = INT64_MAX, xe = -1, ye = -1;
  int64_t pos = 0;
  for (int64_t i = 0; i < m; ++i) {
    if (i % 2 == 1 && counts[i] > 0) {
      int64_t start = pos, end = pos + counts[i] - 1;
      int64_t x0 = start / h, y0 = start % h;
      int64_t x1 = end / h, y1 = end % h;
      xs = std::min(xs, x0);
      xe = std::max(xe, x1);
      if (x0 < x1) { ys = 0; ye = h - 1; }
      else {
        ys = std::min(ys, y0);
        ye = std::max(ye, y1);
      }
    }
    pos += counts[i];
  }
  if (xe < 0) { bbox[0] = bbox[1] = bbox[2] = bbox[3] = 0; return; }
  bbox[0] = (double)xs;
  bbox[1] = (double)ys;
  bbox[2] = (double)(xe - xs + 1);
  bbox[3] = (double)(ye - ys + 1);
}

// Merge n RLEs (union if intersect == 0, intersection otherwise) by a
// linear sweep over run boundaries.
int64_t rle_merge(const uint32_t* all_counts, const int64_t* offsets,
                  const int64_t* lengths, int64_t n, int64_t n_pixels,
                  int intersect, uint32_t* out, int64_t max_out) {
  if (n == 0) return 0;
  std::vector<int64_t> idx(n, 0), boundary(n), value(n, 0);
  for (int64_t j = 0; j < n; ++j)
    boundary[j] = lengths[j] ? all_counts[offsets[j]] : n_pixels;
  for (int64_t j = 0; j < n; ++j) {
    // consume leading zero-length runs
    while (idx[j] + 1 < lengths[j] && boundary[j] == 0) {
      value[j] ^= 1;
      ++idx[j];
      boundary[j] += all_counts[offsets[j] + idx[j]];
    }
  }
  int64_t pos = 0, m = 0;
  uint8_t cur = 0;
  uint32_t run = 0;
  while (pos < n_pixels) {
    // current combined value
    int v = intersect ? 1 : 0;
    int64_t next = n_pixels;
    for (int64_t j = 0; j < n; ++j) {
      int active = (int)(value[j]);
      if (intersect) v = v && active; else v = v || active;
      next = std::min(next, boundary[j]);
    }
    if (next <= pos) next = pos + 1;
    int64_t span = next - pos;
    if ((int)cur == v) {
      run += span;
    } else {
      if (m >= max_out) return -1;
      out[m++] = run;
      run = span;
      cur = (uint8_t)v;
    }
    pos = next;
    for (int64_t j = 0; j < n; ++j) {
      while (boundary[j] <= pos && idx[j] + 1 < lengths[j]) {
        value[j] ^= 1;
        ++idx[j];
        boundary[j] += all_counts[offsets[j] + idx[j]];
      }
      if (boundary[j] <= pos) boundary[j] = n_pixels + 1;
    }
  }
  if (m >= max_out) return -1;
  out[m++] = run;
  return m;
}

// COCO compressed string -> counts; returns run count.
int64_t rle_fr_string(const char* s, uint32_t* counts, int64_t max_counts) {
  int64_t m = 0;
  int64_t p = 0;
  while (s[p]) {
    long x = 0;
    int k = 0, more = 1;
    while (more) {
      char c = s[p] - 48;
      x |= (long)(c & 0x1f) << (5 * k);
      more = c & 0x20;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= -1L << (5 * k);
    }
    // counts are delta-coded against counts[m-2] from the third entry on
    if (m > 2) x += (long)counts[m - 2];
    if (m >= max_counts) return -1;
    counts[m++] = (uint32_t)x;
  }
  return m;
}

// counts -> COCO compressed string; returns string length.
int64_t rle_to_string(const uint32_t* counts, int64_t m, char* out,
                      int64_t max_out) {
  int64_t p = 0;
  for (int64_t i = 0; i < m; ++i) {
    long x = (long)counts[i];
    if (i > 2) x -= (long)counts[i - 2];
    int more = 1;
    while (more) {
      long c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      c += 48;
      if (p >= max_out - 1) return -1;
      out[p++] = (char)c;
    }
  }
  out[p] = 0;
  return p;
}

}  // extern "C"
