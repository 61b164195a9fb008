// 5-bit label unpack: 5 packed bytes -> 8 uint8 class ids (< 32).
//
// Host-side twin of the device packer in
// flair_for_aigle_tpu/ops/pack.py:pack_labels5 (same explicit byte order:
// little-endian 32-bit word holding pixels 0-6's low bits, fifth byte
// holding pixel 6's high bits and pixel 7). The numpy unpack costs ~0.7 s
// per km2 canvas on the 1-core host and sits on the zonal finalize
// critical path; this loop does the same work in ~0.05 s.

#include <cstddef>
#include <cstdint>

extern "C" {

// src: n_groups * 5 bytes; dst: n_groups * 8 bytes.
void fl_unpack5(const uint8_t* src, uint8_t* dst, size_t n_groups) {
  for (size_t g = 0; g < n_groups; ++g) {
    const uint8_t* s = src + g * 5;
    uint8_t* d = dst + g * 8;
    const uint32_t lo = (uint32_t)s[0] | ((uint32_t)s[1] << 8) |
                        ((uint32_t)s[2] << 16) | ((uint32_t)s[3] << 24);
    const uint32_t hi = s[4];
    d[0] = lo & 31u;
    d[1] = (lo >> 5) & 31u;
    d[2] = (lo >> 10) & 31u;
    d[3] = (lo >> 15) & 31u;
    d[4] = (lo >> 20) & 31u;
    d[5] = (lo >> 25) & 31u;
    d[6] = ((lo >> 30) & 3u) | ((hi & 7u) << 2);
    d[7] = (hi >> 3) & 31u;
  }
}

// Row-wise variant writing directly into a (h, dst_w) canvas: each packed
// row is pw bytes -> pw/5*8 pixels, truncated to dst_w (drops the pad
// pixels the device packer added to reach a multiple of 8). Saves the
// intermediate full-width copy numpy needed.
void fl_unpack5_rows(const uint8_t* src, uint8_t* dst, size_t h, size_t pw,
                     size_t dst_w, size_t dst_stride) {
  const size_t groups = pw / 5;
  const size_t full = dst_w / 8;  // groups that fit entirely
  for (size_t y = 0; y < h; ++y) {
    const uint8_t* srow = src + y * pw;
    uint8_t* drow = dst + y * dst_stride;
    fl_unpack5(srow, drow, full);
    if (full < groups && full * 8 < dst_w) {
      uint8_t tail[8];
      fl_unpack5(srow + full * 5, tail, 1);
      for (size_t i = full * 8, j = 0; i < dst_w; ++i, ++j) drow[i] = tail[j];
    }
  }
}

}  // extern "C"
