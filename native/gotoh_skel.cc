// gotoh_skel: threaded chunk-space Gotoh DP over read-skeleton pairs.
//
// Replaces the batched-numpy DP in jtk_tpu/stages/deletion_fill.py
// (_gotoh_batch) for the deletion-fill pair sweep.  The numpy version pads
// every pair in a batch to the max skeleton length (up to MAX_SKEL=160), so
// typical ~8-node pairs pay (160/8)^2 wasted cells; here each pair runs at
// its true (r_len+1) x (q_len+1) size on a worker thread.
//
// Semantics are bit-identical to _gotoh_batch for pairs that pass the
// filters (score >= thr, match_num >= min(min_match, r_len, q_len), no
// adjacent Ins/Del runs): same recurrences, same endpoint tie-breaking
// (states H,I,D in order; last column scanned before last row; first
// maximum wins within a scan; strict > between scans), same traceback
// predecessor preferences (H, then I, then D).
//
// Reference parity: haplotyper/src/encode/deletion_fill.rs:727-827 (score
// fn, alignment) — host runtime kept native per SURVEY §2.4.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int32_t kMinAln = -10000000;

struct Skel {
  const int32_t *ch;
  const int32_t *cl;
  const uint8_t *dr;
  int32_t n;
};

// S(i, j) for read symbol i (0-based) vs oriented query symbol j.
inline int32_t score_at(const Skel &r, int32_t i, const Skel &q, bool fwd,
                        int32_t j) {
  // reversed query: index from the end with direction flipped
  int32_t qj = fwd ? j : q.n - 1 - j;
  uint8_t qd = fwd ? q.dr[qj] : static_cast<uint8_t>(!q.dr[qj]);
  if (r.ch[i] != q.ch[qj] || r.dr[i] != qd) return kMinAln;
  return r.cl[i] == q.cl[qj] ? 1 : -1;
}

struct PairResult {
  bool pass;
  std::vector<uint8_t> kinds;  // 1=M 2=I 3=D (merged RLE)
  std::vector<int32_t> lens;
};

void align_pair(const Skel &r, const Skel &q, bool fwd, int32_t min_match_cap,
                int32_t score_thr, std::vector<int32_t> &H,
                std::vector<int32_t> &I, std::vector<int32_t> &D,
                std::vector<uint8_t> &steps, PairResult *out) {
  const int32_t n = r.n, m = q.n;
  const int32_t w = m + 1;
  H.assign(static_cast<size_t>(n + 1) * w, kMinAln);
  I.assign(static_cast<size_t>(n + 1) * w, kMinAln);
  D.assign(static_cast<size_t>(n + 1) * w, kMinAln);
  H[0] = 0;
  for (int32_t j = 1; j <= m; ++j) I[j] = 0;  // free leading query gap
  for (int32_t i = 1; i <= n; ++i) D[static_cast<size_t>(i) * w] = 0;

  for (int32_t i = 1; i <= n; ++i) {
    int32_t *h = H.data() + static_cast<size_t>(i) * w;
    int32_t *ii = I.data() + static_cast<size_t>(i) * w;
    int32_t *dd = D.data() + static_cast<size_t>(i) * w;
    const int32_t *hp = h - w;
    const int32_t *ip = ii - w;
    const int32_t *dp = dd - w;
    int32_t run = kMinAln - 1;  // running max of H[i][j'] - 1, j' <= j-1
    for (int32_t j = 1; j <= m; ++j) {
      int32_t pb = hp[j - 1];
      if (ip[j - 1] > pb) pb = ip[j - 1];
      if (dp[j - 1] > pb) pb = dp[j - 1];
      h[j] = pb + score_at(r, i - 1, q, fwd, j - 1);
      int32_t dv = hp[j] - 1;
      if (dp[j] > dv) dv = dp[j];
      dd[j] = dv;
      int32_t cand = h[j - 1] - 1;
      if (cand > run) run = cand;
      ii[j] = run;
    }
  }

  // endpoint: states in order H,I,D; last column (j=m, i<=n) then last row
  // (i=n, j<=m); first max within a scan, strict > between scans
  int32_t best_sc = kMinAln, best_i = 0, best_j = 0, best_st = 0;
  const std::vector<int32_t> *tabs[3] = {&H, &I, &D};
  bool first = true;
  for (int st = 0; st < 3; ++st) {
    const std::vector<int32_t> &t = *tabs[st];
    int32_t am = 0, sc = t[m];
    for (int32_t i = 1; i <= n; ++i) {
      int32_t v = t[static_cast<size_t>(i) * w + m];
      if (v > sc) { sc = v; am = i; }
    }
    if (first || sc > best_sc) {
      best_sc = sc; best_i = am; best_j = m; best_st = st; first = false;
    }
    const int32_t *row = t.data() + static_cast<size_t>(n) * w;
    am = 0; sc = row[0];
    for (int32_t j = 1; j <= m; ++j)
      if (row[j] > sc) { sc = row[j]; am = j; }
    if (sc > best_sc) {
      best_sc = sc; best_i = n; best_j = am; best_st = st;
    }
  }

  out->pass = false;
  out->kinds.clear();
  out->lens.clear();
  if (best_sc < score_thr) return;

  // traceback
  steps.clear();
  int32_t i = best_i, j = best_j, st = best_st;
  while (i > 0 && j > 0) {
    const size_t at = static_cast<size_t>(i) * w + j;
    if (st == 0) {
      steps.push_back(1);
      int32_t want = H[at] - score_at(r, i - 1, q, fwd, j - 1);
      const size_t pa = static_cast<size_t>(i - 1) * w + (j - 1);
      st = (H[pa] == want) ? 0 : (I[pa] == want ? 1 : 2);
      --i; --j;
    } else if (st == 1) {
      steps.push_back(2);
      st = (H[at - 1] - 1 == I[at]) ? 0 : 1;
      --j;
    } else {
      steps.push_back(3);
      st = (H[at - w] - 1 == D[at]) ? 0 : 2;
      --i;
    }
  }

  auto push = [&](uint8_t k, int32_t l) {
    if (l <= 0) return;
    if (!out->kinds.empty() && out->kinds.back() == k)
      out->lens.back() += l;
    else {
      out->kinds.push_back(k);
      out->lens.push_back(l);
    }
  };
  push(3, i);  // leading free read gap -> D
  push(2, j);  // leading free query gap -> I
  for (size_t s = steps.size(); s-- > 0;) push(steps[s], 1);
  push(3, n - best_i);  // trailing
  push(2, m - best_j);

  int32_t match_num = 0;
  for (size_t s = 0; s < out->kinds.size(); ++s)
    if (out->kinds[s] == 1) match_num += out->lens[s];
  int32_t mm = min_match_cap;
  if (n < mm) mm = n;
  if (m < mm) mm = m;
  if (match_num < mm) return;
  for (size_t s = 0; s + 1 < out->kinds.size(); ++s) {
    uint8_t a = out->kinds[s], b = out->kinds[s + 1];
    if ((a == 2 && b == 3) || (a == 3 && b == 2)) return;  // improper
  }
  out->pass = true;
}

}  // namespace

extern "C" {

// Skeletons arrive concatenated: ch/cl (int32), dr (uint8), offs (int64,
// n_reads+1).  pairs (P, 3) int32 rows (ri, qi, fwd).  Outputs: pass
// (P,) uint8; merged RLE ops for passing pairs in flat kinds/lens buffers
// with per-pair [start, start+count) ranges.  Returns total ops written,
// or -needed when cap is too small (caller grows and retries).
int64_t gotoh_skel(const int32_t *ch, const int32_t *cl, const uint8_t *dr,
                   const int64_t *offs, int32_t n_reads,
                   const int32_t *pairs, int64_t n_pairs,
                   int32_t min_match_cap, int32_t score_thr,
                   int32_t n_threads, uint8_t *pass, uint8_t *ops_kind,
                   int32_t *ops_len, int64_t *ops_start, int32_t *ops_count,
                   int64_t cap) {
  (void)n_reads;
  if (n_threads < 1) n_threads = 1;
  std::vector<std::vector<PairResult>> results(n_threads);
  std::atomic<int64_t> next{0};
  const int64_t grain = 256;

  std::vector<int64_t> chunk_of(n_pairs);  // thread-chunk id per pair
  std::vector<std::thread> workers;
  std::vector<std::vector<std::pair<int64_t, int64_t>>> ranges(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      std::vector<int32_t> H, I, D;
      std::vector<uint8_t> steps;
      for (;;) {
        int64_t s0 = next.fetch_add(grain);
        if (s0 >= n_pairs) break;
        int64_t s1 = s0 + grain < n_pairs ? s0 + grain : n_pairs;
        ranges[t].emplace_back(s0, results[t].size());
        for (int64_t p = s0; p < s1; ++p) {
          const int32_t ri = pairs[p * 3], qi = pairs[p * 3 + 1];
          const bool fwd = pairs[p * 3 + 2] != 0;
          Skel r{ch + offs[ri], cl + offs[ri], dr + offs[ri],
                 static_cast<int32_t>(offs[ri + 1] - offs[ri])};
          Skel q{ch + offs[qi], cl + offs[qi], dr + offs[qi],
                 static_cast<int32_t>(offs[qi + 1] - offs[qi])};
          results[t].emplace_back();
          align_pair(r, q, fwd, min_match_cap, score_thr, H, I, D, steps,
                     &results[t].back());
        }
      }
    });
  }
  for (auto &w : workers) w.join();

  // stitch thread-local results back into pair order
  std::vector<const PairResult *> by_pair(n_pairs, nullptr);
  for (int t = 0; t < n_threads; ++t) {
    for (auto &rg : ranges[t]) {
      int64_t s0 = rg.first, base = rg.second;
      int64_t s1 = s0 + grain < n_pairs ? s0 + grain : n_pairs;
      for (int64_t p = s0; p < s1; ++p)
        by_pair[p] = &results[t][base + (p - s0)];
    }
  }
  int64_t total = 0;
  for (int64_t p = 0; p < n_pairs; ++p)
    if (by_pair[p]->pass) total += static_cast<int64_t>(by_pair[p]->kinds.size());
  if (total > cap) return -total;
  int64_t cur = 0;
  for (int64_t p = 0; p < n_pairs; ++p) {
    const PairResult &pr = *by_pair[p];
    pass[p] = pr.pass ? 1 : 0;
    ops_start[p] = cur;
    ops_count[p] = pr.pass ? static_cast<int32_t>(pr.kinds.size()) : 0;
    if (pr.pass) {
      std::memcpy(ops_kind + cur, pr.kinds.data(), pr.kinds.size());
      std::memcpy(ops_len + cur, pr.lens.data(),
                  pr.lens.size() * sizeof(int32_t));
      cur += static_cast<int64_t>(pr.kinds.size());
    }
  }
  return total;
}

}  // extern "C"
