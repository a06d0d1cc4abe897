// Host event assembly for the T-resident kernel's output buffers.
//
// The resident Pallas kernel (ops/fused_resident.py) DMAs compacted
// events in (block, interval, slot, pixel) order with per-(block,
// interval) counts; the reference's single-thread transcoder emits
// (interval, raster pixel, slot) order (adder-codec-rs video.rs chunk
// loop). Both the produced and the destination layouts are contiguous
// per (block, interval) segment, so the reorder is one memcpy per
// segment plus — only where some pixel emitted more than one event in
// an interval, which restarts a slot stream and shows up as a pixel
// decrease — a stable in-segment sort by pixel.
//
// This is the native counterpart of assemble_resident_events (numpy),
// which is the end-to-end wall on slow hosts (~0.2 Mev/s measured on a
// 1-core VM vs >100 Mev/s here: the numpy path pays a per-event
// gather/scatter where this pays a per-segment memcpy).
//
// Built on demand with g++ (see ops/native_assemble.py), bound with
// ctypes. No dependencies beyond libc++.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// pixd/out_p: u32 wire-packed events (pix << 8 | d), length `total`.
// t/out_t: optional timestamp array (may both be null), element size
//   t_elem bytes (4 or 8), length `total`.
// counts: (n_blocks, T) i32, row-major, produced (block, interval)
//   segment sizes; sum must equal total.
// Returns the number of segments that needed the in-segment sort fix,
// or -1 if the counts are inconsistent (negative / sum mismatch).
long adder_assemble_events(const uint32_t* pixd, uint32_t* out_p,
                           const uint8_t* t, uint8_t* out_t, long t_elem,
                           const int32_t* counts, long n_blocks, long T,
                           long total) {
  const long S = n_blocks * T;
  // Produced offsets: segment s = i * T + ti in (block, interval) order.
  std::vector<int64_t> prod_off(S);
  int64_t acc = 0;
  for (long s = 0; s < S; ++s) {
    if (counts[s] < 0) return -1;
    prod_off[s] = acc;
    acc += counts[s];
  }
  if (acc != total) return -1;
  // Destination offsets: segments laid out (interval, block)-major.
  std::vector<int64_t> dest_off(S);
  acc = 0;
  for (long ti = 0; ti < T; ++ti) {
    for (long i = 0; i < n_blocks; ++i) {
      const long s = i * T + ti;
      dest_off[s] = acc;
      acc += counts[s];
    }
  }
  for (long s = 0; s < S; ++s) {
    const int64_t c = counts[s];
    if (c == 0) continue;
    std::memcpy(out_p + dest_off[s], pixd + prod_off[s],
                static_cast<size_t>(c) * sizeof(uint32_t));
    if (t != nullptr) {
      std::memcpy(out_t + dest_off[s] * t_elem, t + prod_off[s] * t_elem,
                  static_cast<size_t>(c) * static_cast<size_t>(t_elem));
    }
  }
  // In-segment fix: a slot-stream restart (multi-event pixel) shows up
  // as a pixel decrease inside the segment; stable-sort just those.
  long fixed = 0;
  std::vector<int32_t> order;
  std::vector<uint32_t> tmp_p;
  std::vector<uint8_t> tmp_t;
  for (long s = 0; s < S; ++s) {
    const int64_t c = counts[s];
    if (c <= 1) continue;
    const int64_t a = dest_off[s];
    uint32_t* seg = out_p + a;
    bool bad = false;
    for (int64_t k = 1; k < c; ++k) {
      if ((seg[k] >> 8) < (seg[k - 1] >> 8)) {
        bad = true;
        break;
      }
    }
    if (!bad) continue;
    ++fixed;
    order.resize(c);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [seg](int32_t x, int32_t y) {
                       return (seg[x] >> 8) < (seg[y] >> 8);
                     });
    tmp_p.assign(seg, seg + c);
    for (int64_t k = 0; k < c; ++k) seg[k] = tmp_p[order[k]];
    if (t != nullptr) {
      uint8_t* tseg = out_t + a * t_elem;
      tmp_t.assign(tseg, tseg + c * t_elem);
      for (int64_t k = 0; k < c; ++k) {
        std::memcpy(tseg + k * t_elem, tmp_t.data() + order[k] * t_elem,
                    static_cast<size_t>(t_elem));
      }
    }
  }
  return fixed;
}

}  // extern "C"
