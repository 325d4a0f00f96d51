// Threaded k-mer voting scanner for the K4 mapper's candidate stage.
//
// The TPU-native encode split (SURVEY.md §2.4, minimap2 row): the host owns
// seeding — a sorted k-mer index over the <=1k chunk set and per-read
// diagonal-bin voting — while the device (K3 banded kernel) verifies every
// candidate.  The voting sweep is pure integer scanning; in numpy it costs
// several vector passes over the whole read blob (the encode host
// bottleneck), so this native scanner does it in one rolling pass per read
// lane, parallel over lanes (reference's analogue: minimap2's internal
// pthread seeding, haplotyper/src/encode/mod.rs:342-351).
//
// Semantics mirror jtk_tpu.mapper.ChunkIndex.candidates_batch exactly
// (including the blob-aligned stride phase, floor-division diagonal bins,
// the next-bin count merge, the prev>ct skip and the accepted-bin chain
// suppression) so the numpy path remains a drop-in fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread -o libkmer_vote.so kmer_vote.cc

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct Hit {
  int32_t cid;
  int32_t diag;   // rpos - chunk_pos
};

struct Cand {
  int32_t lane, cid, dmed, c2;
};

inline int64_t floor_div(int64_t a, int64_t b) {
  int64_t q = a / b, r = a % b;
  return (r != 0 && ((r < 0) != (b < 0))) ? q - 1 : q;
}

void scan_lane(const int8_t* codes, int64_t len, int32_t lane_idx,
               int64_t phase, const uint64_t* idx_kmers,
               const int32_t* idx_cids, const int32_t* idx_poss,
               int64_t n_idx, int k, int stride, int max_occ, int min_hits,
               int bin, std::vector<Cand>& out) {
  if (len < k) return;
  const uint64_t mask = (k >= 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
  std::vector<Hit> hits;
  uint64_t val = 0;
  int64_t since_bad = 0;  // #valid bases accumulated since last non-ACGT
  for (int64_t i = 0; i < len; ++i) {
    int8_t c = codes[i];
    if (c < 0 || c > 3) {
      since_bad = 0;
      val = 0;
      continue;
    }
    val = ((val << 2) | (uint64_t)c) & mask;
    if (++since_bad < k) continue;
    int64_t pos = i - k + 1;                       // k-mer start
    if (stride > 1 && (pos % stride) != phase) continue;
    // binary search the sorted index
    const uint64_t* lo =
        std::lower_bound(idx_kmers, idx_kmers + n_idx, val);
    if (lo == idx_kmers + n_idx || *lo != val) continue;
    const uint64_t* hi = std::upper_bound(lo, idx_kmers + n_idx, val);
    int64_t occ = hi - lo;
    if (occ > max_occ) continue;
    for (const uint64_t* p = lo; p != hi; ++p) {
      int64_t j = p - idx_kmers;
      hits.push_back({idx_cids[j], (int32_t)(pos - idx_poss[j])});
    }
  }
  if (hits.empty()) return;
  // group by (cid, dbin) ascending, diag ascending within the group —
  // identical to the numpy lexical key (lane<<44)|(cid<<22)|dbin
  struct Key {
    int64_t cid, dbin;
    int32_t diag;
  };
  std::vector<Key> ks(hits.size());
  for (size_t i = 0; i < hits.size(); ++i)
    ks[i] = {hits[i].cid, floor_div(hits[i].diag, bin), hits[i].diag};
  std::sort(ks.begin(), ks.end(), [](const Key& a, const Key& b) {
    if (a.cid != b.cid) return a.cid < b.cid;
    if (a.dbin != b.dbin) return a.dbin < b.dbin;
    return a.diag < b.diag;
  });
  // group boundaries
  std::vector<int64_t> g_start, g_count;
  std::vector<int64_t> g_cid, g_dbin;
  for (size_t i = 0; i < ks.size();) {
    size_t j = i;
    while (j < ks.size() && ks[j].cid == ks[i].cid &&
           ks[j].dbin == ks[i].dbin)
      ++j;
    g_start.push_back((int64_t)i);
    g_count.push_back((int64_t)(j - i));
    g_cid.push_back(ks[i].cid);
    g_dbin.push_back(ks[i].dbin);
    i = j;
  }
  int64_t ng = (int64_t)g_start.size();
  int64_t last_taken = -3;     // group whose accept blocks dbin, dbin+1
  int64_t last_taken_cid = -1;
  for (int64_t g = 0; g < ng; ++g) {
    int64_t ct = g_count[g];
    int64_t nxt = (g + 1 < ng && g_cid[g + 1] == g_cid[g] &&
                   g_dbin[g + 1] == g_dbin[g] + 1)
                      ? g_count[g + 1]
                      : 0;
    int64_t c2 = ct + nxt;
    if (c2 < min_hits) continue;
    int64_t prev = (g > 0 && g_cid[g - 1] == g_cid[g] &&
                    g_dbin[g - 1] == g_dbin[g] - 1)
                       ? g_count[g - 1]
                       : 0;
    if (prev > ct) continue;
    // accepted bin u blocks bins u, u+1, u+2 of the same chunk
    if (last_taken_cid == g_cid[g] && g_dbin[g] <= last_taken + 2) continue;
    last_taken = g_dbin[g];
    last_taken_cid = g_cid[g];
    // median diag of THIS bin's hits (numpy: int(np.median(slice)))
    const int64_t st = g_start[g];
    double m =
        ((double)ks[st + (ct - 1) / 2].diag + (double)ks[st + ct / 2].diag) /
        2.0;
    out.push_back({lane_idx, (int32_t)g_cid[g], (int32_t)m, (int32_t)c2});
  }
}

}  // namespace

extern "C" {

// Returns the number of candidates written (<= out_cap), or -(total needed)
// when out_cap is too small (caller re-allocates and retries).
int64_t kmer_vote(const int8_t* blob, const int64_t* lane_starts,
                  const int64_t* lane_lens, const int64_t* lane_phases,
                  int32_t n_lanes, const uint64_t* idx_kmers,
                  const int32_t* idx_cids, const int32_t* idx_poss,
                  int64_t n_idx, int32_t k, int32_t stride, int32_t max_occ,
                  int32_t min_hits, int32_t bin, int32_t n_threads,
                  int32_t* out_lane, int32_t* out_cid, int32_t* out_dmed,
                  int32_t* out_c2, int64_t out_cap) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::vector<Cand>> results(n_lanes);
  std::atomic<int32_t> next{0};
  auto worker = [&]() {
    for (;;) {
      int32_t lane = next.fetch_add(1);
      if (lane >= n_lanes) return;
      scan_lane(blob + lane_starts[lane], lane_lens[lane], lane,
                lane_phases[lane], idx_kmers, idx_cids, idx_poss, n_idx, k,
                stride, max_occ, min_hits, bin, results[lane]);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  int64_t total = 0;
  for (auto& r : results) total += (int64_t)r.size();
  if (total > out_cap) return -total;
  int64_t w = 0;
  for (auto& r : results)
    for (auto& c : r) {
      out_lane[w] = c.lane;
      out_cid[w] = c.cid;
      out_dmed[w] = c.dmed;
      out_c2[w] = c.c2;
      ++w;
    }
  return total;
}
}
