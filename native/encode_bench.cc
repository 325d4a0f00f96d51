// Single-thread CPU encode benchmark — the measured baseline for bench.py.
//
// The reference pipeline's encode stage is minimap2 seed/chain plus
// per-alignment banded refinement (encode/mod.rs:315-355 + edlib/kiley); its
// Rust toolchain is not available in this image, so this harness re-creates
// the same work profile natively: a sorted k-mer index over the chunk set,
// per-read diagonal voting (both strands), and a banded edit-distance
// alignment with traceback for every candidate placement.  bench.py runs it
// on the identical synthetic dataset it feeds the TPU path and uses the
// resulting reads/s as the measured CPU baseline.
//
// Build: g++ -O3 -march=native -o encode_bench encode_bench.cc

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int K = 17;  // reference minimap2 ONT seeding (-k17, encode/mod.rs:348)
constexpr int STRIDE = 3;
constexpr int MIN_HITS = 4;
constexpr int MARGIN = 200;
constexpr int BAND = 256;
constexpr int MAX_OCC = 64;
constexpr double SIM_THR = 0.15;

int8_t code_of(char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return 4;
  }
}

std::vector<std::vector<int8_t>> read_fasta(const char* path) {
  std::ifstream in(path);
  std::vector<std::vector<int8_t>> seqs;
  std::string line;
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    if (line[0] == '>') {
      seqs.emplace_back();
      continue;
    }
    auto& cur = seqs.back();
    for (char c : line) cur.push_back(code_of(c));
  }
  return seqs;
}

std::vector<int8_t> revcomp(const std::vector<int8_t>& s) {
  std::vector<int8_t> out(s.size());
  for (size_t i = 0; i < s.size(); ++i) {
    int8_t b = s[s.size() - 1 - i];
    out[i] = b < 4 ? int8_t(3 - b) : int8_t(4);
  }
  return out;
}

struct IndexEntry {
  uint64_t kmer;
  int32_t chunk;
  int32_t pos;
};

// Banded edit distance with traceback: query = chunk (global), target =
// window (free ends).  Returns (dist, ops_done) — ops are walked to mirror
// the reference's per-alignment CIGAR construction cost.
int banded_align(const std::vector<int8_t>& q, const int8_t* t, int t_len,
                 int diag, std::vector<uint8_t>* ptr_store) {
  const int Q = int(q.size());
  const int W = BAND;
  const int INF = 1 << 28;
  std::vector<int> prev(W), cur(W);
  std::vector<int> offs(Q + 1);
  for (int i = 0; i <= Q; ++i) {
    int off = diag + i - W / 2;
    if (off < 0) off = 0;
    if (off > std::max(t_len - W + 1, 0)) off = std::max(t_len - W + 1, 0);
    offs[i] = off;
  }
  // enforce unit steps
  for (int i = 1; i <= Q; ++i) {
    if (offs[i] < offs[i - 1]) offs[i] = offs[i - 1];
    if (offs[i] > offs[i - 1] + 1) offs[i] = offs[i - 1] + 1;
  }
  ptr_store->assign(size_t(Q + 1) * W, 0);
  for (int kk = 0; kk < W; ++kk) {
    int j = offs[0] + kk;
    prev[kk] = j <= t_len ? 0 : INF;  // free leading target gap (infix)
  }
  for (int i = 1; i <= Q; ++i) {
    int s = offs[i] - offs[i - 1];
    uint8_t* prow = ptr_store->data() + size_t(i) * W;
    int8_t qc = q[i - 1];
    for (int kk = 0; kk < W; ++kk) {
      int j = offs[i] + kk;
      if (j > t_len) { cur[kk] = INF; continue; }
      int diagv = (kk + s - 1 >= 0 && kk + s - 1 < W) ? prev[kk + s - 1] : INF;
      int upv = (kk + s < W) ? prev[kk + s] : INF;
      int leftv = kk > 0 ? cur[kk - 1] : INF;
      int sub = (j >= 1 && j <= t_len && t[j - 1] == qc) ? 0 : 1;
      int best = INF;
      uint8_t p = 0;
      if (j >= 1 && diagv + sub < best) { best = diagv + sub; p = 0; }
      if (upv + 1 < best) { best = upv + 1; p = 1; }
      if (leftv + 1 < best) { best = leftv + 1; p = 2; }
      cur[kk] = best;
      prow[kk] = p;
    }
    std::swap(prev, cur);
  }
  // free trailing target gap: min over last row
  int best = INF, bestk = 0;
  for (int kk = 0; kk < W; ++kk) {
    int j = offs[Q] + kk;
    if (j <= t_len && prev[kk] < best) { best = prev[kk]; bestk = kk; }
  }
  // traceback (consumes the pointer matrix like the real encoder)
  int i = Q, j = offs[Q] + bestk;
  int steps = 0;
  while (i > 0 && j >= 0 && steps < 2 * (Q + t_len)) {
    int kk = j - offs[i];
    if (kk < 0 || kk >= W) break;
    uint8_t p = (*ptr_store)[size_t(i) * W + kk];
    if (p == 0) { --i; --j; }
    else if (p == 1) { --i; }
    else { --j; }
    ++steps;
  }
  return best;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s reads.fa chunks.fa [dump.tsv]\n",
                 argv[0]);
    return 1;
  }
  auto reads = read_fasta(argv[1]);
  auto chunks = read_fasta(argv[2]);
  FILE* dump = argc > 3 ? std::fopen(argv[3], "w") : nullptr;

  // ---- index the chunk set ----
  std::vector<IndexEntry> index;
  for (size_t ci = 0; ci < chunks.size(); ++ci) {
    const auto& s = chunks[ci];
    if (s.size() < K) continue;
    uint64_t val = 0;
    int run = 0;
    for (size_t p = 0; p < s.size(); ++p) {
      if (s[p] > 3) { run = 0; val = 0; continue; }
      val = ((val << 2) | uint64_t(s[p])) & ((1ULL << (2 * K)) - 1);
      if (++run >= K)
        index.push_back({val, int32_t(ci), int32_t(p - K + 1)});
    }
  }
  std::sort(index.begin(), index.end(),
            [](const IndexEntry& a, const IndexEntry& b) {
              return a.kmer < b.kmer;
            });

  auto t0 = std::chrono::steady_clock::now();
  long n_nodes = 0;
  std::vector<uint8_t> ptrs;
  for (size_t read_i = 0; read_i < reads.size(); ++read_i) {
    const auto& read = reads[read_i];
    for (int strand = 0; strand < 2; ++strand) {
      std::vector<int8_t> oriented =
          strand == 0 ? read : revcomp(read);
      // k-mer hits -> (chunk, diag-bin) votes
      std::unordered_map<int64_t, int> votes;
      std::unordered_map<int64_t, long> diag_sum;
      if (oriented.size() < K) continue;
      uint64_t val = 0;
      int run = 0;
      for (size_t p = 0; p < oriented.size(); ++p) {
        if (oriented[p] > 3) { run = 0; val = 0; continue; }
        val = ((val << 2) | uint64_t(oriented[p])) & ((1ULL << (2 * K)) - 1);
        if (++run < K) continue;
        size_t rp = p - K + 1;
        if (rp % STRIDE) continue;
        auto lo = std::lower_bound(
            index.begin(), index.end(), val,
            [](const IndexEntry& e, uint64_t v) { return e.kmer < v; });
        auto hi = lo;
        while (hi != index.end() && hi->kmer == val) ++hi;
        if (hi - lo == 0 || hi - lo > MAX_OCC) continue;
        for (auto it = lo; it != hi; ++it) {
          long diag = long(rp) - it->pos;
          int64_t key = (int64_t(it->chunk) << 24) | ((diag / 128) + (1 << 20));
          votes[key] += 1;
          diag_sum[key] += diag;
        }
      }
      // candidates -> banded align + traceback
      for (const auto& kv : votes) {
        if (kv.second < MIN_HITS) continue;
        int chunk_id = int(kv.first >> 24);
        const auto& cseq = chunks[chunk_id];
        long dmed = diag_sum[kv.first] / kv.second;
        long a = std::max(dmed - MARGIN, 0L);
        long b = std::min(dmed + long(cseq.size()) + MARGIN,
                          long(oriented.size()));
        if (b - a < long(cseq.size()) / 2) continue;
        int dist = banded_align(cseq, oriented.data() + a, int(b - a),
                                int(dmed - a), &ptrs);
        if (dist < SIM_THR * cseq.size()) {
          ++n_nodes;
          if (dump)
            std::fprintf(dump, "%zu\t%d\t%d\t%ld\t%d\n", read_i,
                         chunk_id, strand, dmed, dist);
        }
      }
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  std::printf(
      "{\"reads\": %zu, \"nodes\": %ld, \"seconds\": %.3f, "
      "\"reads_per_s\": %.2f}\n",
      reads.size(), n_nodes, dt, reads.size() / dt);
  if (dump) std::fclose(dump);
  return 0;
}
