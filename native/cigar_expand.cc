// cigar_expand: batched RLE cigar construction from the device's packed
// traceback streams (is-insertion bitplane + sparse deletion runs).
//
// Replaces the per-row numpy pipeline in jtk_tpu/ops/banded_align.py
// (decode_indexed/_expand_cigar) — the encode stage's main host cost after
// the device kernels.  Semantics are identical: for each row b with query
// length ql, the traceback row order is reversed into forward order, every
// query char emits one M/I op followed by a D run (possibly 0), a leading
// D run of lead_d[b] is prepended, zero-length runs are dropped and
// adjacent same-kind runs merge.
//
// Reference parity: the cigar consumers match haplotyper/src/encode/mod.rs
// (node CIGARs) — this is host runtime, kept native per SURVEY §2.4.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline bool get_bit(const uint8_t *row, int64_t t) {
  return (row[t >> 3] >> (t & 7)) & 1;  // little-endian bit order
}

}  // namespace

extern "C" {

// Returns total runs written, or -needed when cap is too small (caller
// reallocates and retries).  Arrays:
//   bits      (B, bytes_per_row) packed little-endian is-insertion plane
//   del_vals  (B, K) uint16 run lengths (0 = unused slot)
//   del_idx   (B, K) uint16 row index of each run
//   q_lens    (B,) query length per row
//   lead_d    (B,) leading deletion run (0 for infix mode)
//   out_kinds (cap,) 1=M 2=I 3=D; out_lens (cap,)
//   row_off   (B+1,) run range per row
int64_t cigar_expand(const uint8_t *bits, int64_t bytes_per_row,
                     const uint16_t *del_vals, const uint16_t *del_idx,
                     int32_t K, const int32_t *q_lens, const int32_t *lead_d,
                     int32_t B, uint8_t *out_kinds, int32_t *out_lens,
                     int64_t cap, int64_t *row_off) {
  int32_t max_q = 0;
  for (int32_t b = 0; b < B; ++b)
    if (q_lens[b] > max_q) max_q = q_lens[b];
  std::vector<int32_t> dels(static_cast<size_t>(max_q) + 1, 0);

  int64_t n = 0;
  bool overflow = false;
  for (int32_t b = 0; b < B; ++b) {
    row_off[b] = n;
    const int32_t ql = q_lens[b];
    const uint8_t *row = bits + b * bytes_per_row;
    const uint16_t *dv = del_vals + static_cast<int64_t>(b) * K;
    const uint16_t *di = del_idx + static_cast<int64_t>(b) * K;
    // sparse scatter of deletion runs (indices beyond ql are stale top-k
    // padding — ignored, matching decode_indexed)
    for (int32_t s = 0; s < K; ++s)
      if (dv[s] > 0 && di[s] < ql) dels[di[s]] = dv[s];

    uint8_t cur_kind = 0;
    int64_t cur_len = 0;
    auto emit = [&](uint8_t kind, int64_t len) {
      if (len == 0) return;
      if (kind == cur_kind) {
        cur_len += len;
        return;
      }
      if (cur_kind != 0) {
        if (n < cap) {
          out_kinds[n] = cur_kind;
          out_lens[n] = static_cast<int32_t>(cur_len);
        }
        ++n;
      }
      cur_kind = kind;
      cur_len = len;
    };

    emit(3, lead_d[b] > 0 ? lead_d[b] : 0);
    for (int32_t t = ql - 1; t >= 0; --t) {  // reversed rows = forward order
      emit(get_bit(row, t) ? 2 : 1, 1);
      emit(3, dels[t]);
    }
    if (cur_kind != 0) {
      if (n < cap) {
        out_kinds[n] = cur_kind;
        out_lens[n] = static_cast<int32_t>(cur_len);
      }
      ++n;
    }
    if (n > cap) overflow = true;

    for (int32_t s = 0; s < K; ++s)  // reset scratch (touched slots only)
      if (dv[s] > 0 && di[s] < ql) dels[di[s]] = 0;
  }
  row_off[B] = n;
  return overflow ? -n : n;
}

}  // extern "C"
