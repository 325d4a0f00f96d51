// Single-thread CPU phasing baseline: the reference's per-chunk clustering
// work profile (kiley modification_table + polish + k-means++/Metropolis
// MCMC, haplotyper/src/local_clustering/pseudo_mcmc.rs:704-762 and
// kiley's modification_table_antidiagonal) implemented natively so
// BENCH chunks-phased/s has a measured single-thread CPU denominator
// (BASELINE.md names the metric; the reference's Rust toolchain is absent
// from this image — this mirrors native/encode_bench.cc for encode).
//
// Work per chunk pileup, matching the production TPU path
// (jtk_tpu/stages/local_clustering.py):
//   1. polish: rounds of {per-read banded fwd/bwd pair-HMM + closed-form
//      NUM_ROW=14 modification table, summed; spaced edits applied} until
//      no gain (max 6 rounds);
//   2. profile pass: per-read gain tables at the polished template;
//      variant columns = top total-gain columns;
//   3. clustering: 20 restarts of k-means++ init + 2000*R Metropolis flips
//      (production effort; pseudo_mcmc.rs:728, misc.rs:231-341) with the
//      informative-column-gated objective.
//
// Input (binary): u32 n_chunks, then per chunk: u32 t_len, t_len bytes
// (codes 0..3), u32 R, then R x { u32 q_len, q_len bytes }.
// Output: one JSON line {chunks, reads, seconds, chunks_per_s}.
//
// --selftest: validates the banded fwd/bwd + modification table against a
// brute-force per-edit re-forward on random small instances.

#include <algorithm>
#include <cassert>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

namespace {

constexpr int COPY_SIZE = 3;
constexpr int DEL_SIZE = 3;
constexpr int NUM_EDIT = 8 + COPY_SIZE + DEL_SIZE;  // 14
constexpr float EPS = 1e-30f;

struct Params {
  float t[3][3];
  float me[5][5];  // padded: code 4 emits 0
  float ie[5][5];
  Params() {
    float tm[3][3] = {{0.97f, 0.01f, 0.01f},
                      {0.97f, 0.01f, 0.01f},
                      {0.97f, 0.01f, 0.01f}};
    std::memcpy(t, tm, sizeof(tm));
    std::memset(me, 0, sizeof(me));
    std::memset(ie, 0, sizeof(ie));
    for (int r = 0; r < 4; ++r)
      for (int q = 0; q < 4; ++q) me[r][q] = (r == q) ? 0.97f : 0.01f;
    for (int p = 0; p < 5; ++p)
      for (int q = 0; q < 4; ++q) ie[p][q] = 0.25f;
  }
};

// Banded tables: row i (0..Q), lane k (0..W); column j = off[i] + k.
struct Banded {
  int Q, W, T;
  std::vector<int> off;         // (Q+1)
  std::vector<float> M, I, D;   // (Q+1)*W
  std::vector<float> cum;       // (Q+1) cumulative log scale
  float lk = 0.f;
  float at(const std::vector<float>& tab, int i, int j) const {
    if (i < 0 || i > Q) return 0.f;
    int k = j - off[i];
    if (k < 0 || k >= W) return 0.f;
    return tab[(size_t)i * W + k];
  }
};

std::vector<int> linear_offsets(int q_len, int t_len, int W) {
  // straight line (0,0)->(q_len,t_len), unit steps (ops/banded_align.py:31)
  std::vector<int> off(q_len + 1);
  int hi = std::max(t_len - W + 1, 0);
  long prev = 0;
  for (int i = 0; i <= q_len; ++i) {
    long center = std::lround((double)i * t_len / std::max(q_len, 1));
    long o = std::min(std::max(center - W / 2, 0L), (long)hi);
    long line = (long)(t_len - W + 1) - (q_len - i);
    o = std::max(o, std::max(line, 0L));
    o = std::max(o, prev);          // non-decreasing
    o = std::min(o, prev + 1);      // unit steps
    off[i] = (int)o;
    prev = o;
  }
  return off;
}

// Conditional pair-HMM forward, probability space with per-row rescaling.
// Row i consumes q[i-1]; column j consumes r[j-1] (in M or D).
void forward_banded(const uint8_t* q, int q_len, const uint8_t* r, int t_len,
                    const Params& P, int W, Banded* out) {
  out->Q = q_len;
  out->W = W;
  out->T = t_len;
  out->off = linear_offsets(q_len, t_len, W);
  out->M.assign((size_t)(q_len + 1) * W, 0.f);
  out->I.assign((size_t)(q_len + 1) * W, 0.f);
  out->D.assign((size_t)(q_len + 1) * W, 0.f);
  out->cum.assign(q_len + 1, 0.f);
  const auto& off = out->off;
  float tmm = P.t[0][0], tmi = P.t[0][1], tmd = P.t[0][2];
  float tim = P.t[1][0], tii = P.t[1][1], tid = P.t[1][2];
  float tdm = P.t[2][0], tdi = P.t[2][1], tdd = P.t[2][2];
  // row 0: M(0,0)=1, D(0,j)=tmd*tdd^(j-1)
  {
    float* M0 = &out->M[0];
    float* D0 = &out->D[0];
    double s = 0;
    for (int k = 0; k < W; ++k) {
      int j = off[0] + k;
      if (j == 0) M0[k] = 1.f;
      if (j >= 1 && j <= t_len) D0[k] = tmd * std::pow(tdd, j - 1);
      s += M0[k] + D0[k];
    }
    s += 1e-30;
    for (int k = 0; k < W; ++k) { M0[k] /= s; D0[k] /= s; }
    out->cum[0] = std::log(s);
  }
  for (int i = 1; i <= q_len; ++i) {
    const float* Mp = &out->M[(size_t)(i - 1) * W];
    const float* Ip = &out->I[(size_t)(i - 1) * W];
    const float* Dp = &out->D[(size_t)(i - 1) * W];
    float* Mc = &out->M[(size_t)i * W];
    float* Ic = &out->I[(size_t)i * W];
    float* Dc = &out->D[(size_t)i * W];
    int qc = q[i - 1];
    int qp = (i >= 2) ? q[i - 2] : 4;
    float ei = P.ie[qp][qc];
    int s_ = off[i] - off[i - 1];  // 0 or 1
    double sum = 0;
    float dprev = 0.f;
    for (int k = 0; k < W; ++k) {
      int j = off[i] + k;
      int kp = k + s_;  // lane of col j in row i-1
      int kpd = kp - 1; // lane of col j-1 in row i-1
      float md = (kpd >= 0 && kpd < W) ? Mp[kpd] : 0.f;
      float id = (kpd >= 0 && kpd < W) ? Ip[kpd] : 0.f;
      float dd = (kpd >= 0 && kpd < W) ? Dp[kpd] : 0.f;
      float mu = (kp < W) ? Mp[kp] : 0.f;
      float iu = (kp < W) ? Ip[kp] : 0.f;
      float du = (kp < W) ? Dp[kp] : 0.f;
      float em = (j >= 1 && j <= t_len) ? P.me[r[j - 1]][qc] : 0.f;
      float m = em * (tmm * md + tim * id + tdm * dd);
      float iv = (j <= t_len) ? ei * (tmi * mu + tii * iu + tdi * du) : 0.f;
      float mprev = (k >= 1) ? Mc[k - 1] : 0.f;
      float iprev = (k >= 1) ? Ic[k - 1] : 0.f;
      float d = (j >= 1 && j <= t_len)
                    ? (tmd * mprev + tid * iprev + tdd * dprev)
                    : 0.f;
      Mc[k] = m;
      Ic[k] = iv;
      Dc[k] = d;
      dprev = d;
      sum += m + iv + d;
    }
    sum += 1e-30;
    for (int k = 0; k < W; ++k) { Mc[k] /= sum; Ic[k] /= sum; Dc[k] /= sum; }
    out->cum[i] = out->cum[i - 1] + std::log(sum);
  }
  int ke = t_len - off[q_len];
  float fin = 0.f;
  if (ke >= 0 && ke < W)
    fin = out->M[(size_t)q_len * W + ke] + out->I[(size_t)q_len * W + ke] +
          out->D[(size_t)q_len * W + ke];
  out->lk = std::log(fin + EPS) + out->cum[q_len];
}

// Backward: bX(i,j) = P(emit q[i..], consume r[j..] | in state X at (i,j)).
// (q/r indices 0-based from the NEXT char; bcum[i] analogous to fwd.)
void backward_banded(const uint8_t* q, int q_len, const uint8_t* r, int t_len,
                     const Params& P, const std::vector<int>& off, int W,
                     Banded* out) {
  out->Q = q_len;
  out->W = W;
  out->T = t_len;
  out->off = off;
  out->M.assign((size_t)(q_len + 1) * W, 0.f);
  out->I.assign((size_t)(q_len + 1) * W, 0.f);
  out->D.assign((size_t)(q_len + 1) * W, 0.f);
  out->cum.assign(q_len + 1, 0.f);
  float tmm = P.t[0][0], tmi = P.t[0][1], tmd = P.t[0][2];
  float tim = P.t[1][0], tii = P.t[1][1], tid = P.t[1][2];
  float tdm = P.t[2][0], tdi = P.t[2][1], tdd = P.t[2][2];
  {
    float* Mq = &out->M[(size_t)q_len * W];
    float* Iq = &out->I[(size_t)q_len * W];
    float* Dq = &out->D[(size_t)q_len * W];
    double mx = 0;
    for (int k = W - 1; k >= 0; --k) {
      int j = off[q_len] + k;
      if (j > t_len) continue;
      float dn = (k + 1 < W) ? Dq[k + 1] : 0.f;
      Dq[k] = (j == t_len) ? 1.f : tdd * dn;  // tdd^(t_len-j)
      Mq[k] = (j == t_len) ? 1.f : tmd * dn * tdd / tdd;  // tmd*tdd^(t_len-j-1)
      Iq[k] = (j == t_len) ? 1.f : tid * dn * tdd / tdd;
      // dn = tdd^(t_len-j-1) already, so use it directly:
      if (j != t_len) { Mq[k] = tmd * dn; Iq[k] = tid * dn; }
      mx = std::max(mx, (double)(Mq[k] + Iq[k] + Dq[k]));
    }
    mx += 1e-30;
    for (int k = 0; k < W; ++k) { Mq[k] /= mx; Iq[k] /= mx; Dq[k] /= mx; }
    out->cum[q_len] = std::log(mx);
  }
  for (int i = q_len - 1; i >= 0; --i) {
    const float* Mn = &out->M[(size_t)(i + 1) * W];
    const float* In = &out->I[(size_t)(i + 1) * W];
    float* Mc = &out->M[(size_t)i * W];
    float* Ic = &out->I[(size_t)i * W];
    float* Dc = &out->D[(size_t)i * W];
    int qn = q[i];                      // q[i+1] 1-based
    int qp = (i >= 1) ? q[i - 1] : 4;   // context q[i] 1-based
    float ei = P.ie[qp][qn];
    int s_ = off[i + 1] - off[i];
    double mx = 0;
    float dnext = 0.f;
    for (int k = W - 1; k >= 0; --k) {
      int j = off[i] + k;
      if (j > t_len) { Mc[k] = Ic[k] = Dc[k] = 0.f; continue; }
      int kn = k - s_;      // lane of col j in row i+1
      int knd = kn + 1;     // lane of col j+1 in row i+1
      float em = (j + 1 <= t_len) ? P.me[r[j]][qn] : 0.f;
      float u = (knd >= 0 && knd < W) ? em * Mn[knd] : 0.f;
      float v = (kn >= 0 && kn < W) ? ei * In[kn] : 0.f;
      float w = dnext;  // bD(i, j+1): lane k+1 current row (computed already)
      float d = tdm * u + tdi * v + tdd * w;
      Mc[k] = tmm * u + tmi * v + tmd * w;
      Ic[k] = tim * u + tii * v + tid * w;
      Dc[k] = d;
      dnext = d;
      mx = std::max(mx, (double)(Mc[k] + Ic[k] + Dc[k]));
    }
    mx += 1e-30;
    for (int k = 0; k < W; ++k) { Mc[k] /= mx; Ic[k] /= mx; Dc[k] /= mx; }
    out->cum[i] = out->cum[i + 1] + std::log(mx);
  }
}

// Wait: bD(i, j+1) must be the CURRENT row's D at lane k+1 — but D at lane
// k+1 depends on u/v at k+1, computed before k in the reverse loop.  The
// recurrence above walks k from W-1 down, so dnext holds D[k+1].  Correct.

// Closed-form NUM_EDIT modification table (math: jtk_tpu/ops/modtable.py).
// out_tab: (t_len+2) x NUM_EDIT log-likelihood of each 1-edit.
void modification_table(const uint8_t* q, int q_len, const uint8_t* r,
                        int t_len, const Params& P, int W,
                        const Banded& F, const Banded& B,
                        std::vector<float>* out_tab) {
  float tmm = P.t[0][0], tmi = P.t[0][1], tmd = P.t[0][2];
  float tim = P.t[1][0], tii = P.t[1][1], tid = P.t[1][2];
  float tdm = P.t[2][0], tdi = P.t[2][1], tdd = P.t[2][2];
  int TC = t_len + 2;
  std::vector<double> acc((size_t)TC * NUM_EDIT, 0.0);
  const auto& off = F.off;
  float lk = F.lk;
  for (int i = 0; i <= q_len; ++i) {
    float cA = (i >= 1)
                   ? std::exp(std::min(std::max(
                         F.cum[i - 1] + B.cum[i] - lk, -80.f), 80.f))
                   : 0.f;
    float cB = std::exp(std::min(std::max(F.cum[i] + B.cum[i] - lk, -80.f),
                                 80.f));
    int qc = (i >= 1) ? q[i - 1] : 4;
    for (int k = 0; k < W; ++k) {
      int jc = off[i] + k;
      if (jc < 0 || jc > t_len) continue;
      float A = tmm * F.at(F.M, i - 1, jc - 1) +
                tim * F.at(F.I, i - 1, jc - 1) +
                tdm * F.at(F.D, i - 1, jc - 1);
      float Anext = tmm * F.at(F.M, i - 1, jc) +
                    tim * F.at(F.I, i - 1, jc) +
                    tdm * F.at(F.D, i - 1, jc);
      float Dnew = tmd * F.at(F.M, i, jc - 1) + tid * F.at(F.I, i, jc - 1) +
                   tdd * F.at(F.D, i, jc - 1);
      float Dnext = tmd * F.at(F.M, i, jc) + tid * F.at(F.I, i, jc) +
                    tdd * F.at(F.D, i, jc);
      float bM = B.at(B.M, i, jc);
      float bD = B.at(B.D, i, jc);
      float fD = F.at(F.D, i, jc);
      // substitutions at j=jc-1 (plus base term) and insertions before jc
      for (int b = 0; b < 4; ++b) {
        float emq = (i >= 1) ? P.me[b][qc] : 0.f;
        if (jc >= 1)
          acc[(size_t)(jc - 1) * NUM_EDIT + b] +=
              emq * A * bM * cA + (b == 0 ? 1.f : 0.f) * fD * bD * cB;
        acc[(size_t)jc * NUM_EDIT + 4 + b] +=
            emq * Anext * bM * cA + (b == 0 ? 1.f : 0.f) * Dnext * bD * cB;
      }
      // the fD*bD / Dnext*bD base terms are b-independent; added under b==0
      // above then replicated:
      if (jc >= 1) {
        float base = F.at(F.D, i, jc) * bD * cB;
        for (int b = 1; b < 4; ++b)
          acc[(size_t)(jc - 1) * NUM_EDIT + b] += base;
      }
      {
        float base = Dnext * bD * cB;
        for (int b = 1; b < 4; ++b)
          acc[(size_t)jc * NUM_EDIT + 4 + b] += base;
      }
      // deletions of t[j..j+d], j = jc-1
      if (jc >= 1) {
        for (int d = 1; d <= DEL_SIZE; ++d) {
          if (jc - 1 + d > t_len) break;
          int rc = (jc + d - 1 < t_len) ? r[jc + d - 1] : 4;
          float emd = (i >= 1 && rc < 4) ? P.me[rc][qc] : 0.f;
          float bMd = B.at(B.M, i, jc + d);
          float bDd = B.at(B.D, i, jc + d);
          acc[(size_t)(jc - 1) * NUM_EDIT + 8 + COPY_SIZE + d - 1] +=
              emd * A * bMd * cA + Dnew * bDd * cB;
        }
      }
    }
  }
  // copies of t[j..j+c] anchored at column J (j = J-c): the extension walks
  // the c copied columns with an M/D chain whose M-steps consume one query
  // char each (row_down) — full banded temp tables, bucketed by consumed
  // query chars u (modtable.py:249-293)
  {
    size_t NW = (size_t)(q_len + 1) * W;
    auto at_col = [&](const std::vector<float>& tab, int i, int jc) {
      return F.at(tab, i, jc);
    };
    std::vector<float> Anext_t(NW, 0.f), Dnext_t(NW, 0.f);
    for (int i = 0; i <= q_len; ++i)
      for (int k = 0; k < W; ++k) {
        int jc = off[i] + k;
        if (jc < 0 || jc > t_len) continue;
        Anext_t[(size_t)i * W + k] =
            tmm * at_col(F.M, i - 1, jc) + tim * at_col(F.I, i - 1, jc) +
            tdm * at_col(F.D, i - 1, jc);
        Dnext_t[(size_t)i * W + k] =
            tmd * F.M[(size_t)i * W + k] + tid * F.I[(size_t)i * W + k] +
            tdd * F.D[(size_t)i * W + k];
      }
    for (int c = 1; c <= COPY_SIZE; ++c) {
      // Mb[u], Db[u] over (i,k)
      std::vector<std::vector<float>> Mb(c + 2), Db(c + 2);
      for (auto& v : Mb) v.assign(NW, 0.f);
      for (auto& v : Db) v.assign(NW, 0.f);
      for (int m = 1; m <= c; ++m) {
        if (m == 1) {
          for (int i = 0; i <= q_len; ++i) {
            int qc = (i >= 1) ? q[i - 1] : 4;
            for (int k = 0; k < W; ++k) {
              int jc = off[i] + k;
              int rm = jc - (c - m) - 1;  // m-th copied char r[J-c+m-1]
              float emm = (rm >= 0 && rm < t_len && i >= 1)
                              ? P.me[r[rm]][qc] : 0.f;
              Mb[1][(size_t)i * W + k] = emm * Anext_t[(size_t)i * W + k];
              Db[0][(size_t)i * W + k] = Dnext_t[(size_t)i * W + k];
            }
          }
        } else {
          std::vector<std::vector<float>> nM(c + 2), nD(c + 2);
          for (auto& v : nM) v.assign(NW, 0.f);
          for (auto& v : nD) v.assign(NW, 0.f);
          for (int i = 0; i <= q_len; ++i) {
            int qc = (i >= 1) ? q[i - 1] : 4;
            for (int k = 0; k < W; ++k) {
              int jc = off[i] + k;
              int rm = jc - (c - m) - 1;
              float emm = (rm >= 0 && rm < t_len && i >= 1)
                              ? P.me[r[rm]][qc] : 0.f;
              for (int u = 0; u <= c; ++u) {
                // row_down: value at (i-1, same column jc)
                float md = at_col(Mb[u], i - 1, jc);
                float dd = at_col(Db[u], i - 1, jc);
                if (u + 1 <= c + 1)
                  nM[u + 1][(size_t)i * W + k] +=
                      emm * (tmm * md + tdm * dd);
                nD[u][(size_t)i * W + k] =
                    tmd * Mb[u][(size_t)i * W + k] +
                    tdd * Db[u][(size_t)i * W + k];
              }
            }
          }
          Mb.swap(nM);
          Db.swap(nD);
        }
      }
      for (int i = 0; i <= q_len; ++i) {
        float cU2[COPY_SIZE + 2] = {0};
        cU2[0] = std::exp(std::min(std::max(F.cum[i] + B.cum[i] - lk, -80.f),
                                   80.f));
        for (int u = 1; u <= COPY_SIZE + 1 && u <= i; ++u)
          cU2[u] = std::exp(std::min(std::max(
              F.cum[i - u] + B.cum[i] - lk, -80.f), 80.f));
        for (int k = 0; k < W; ++k) {
          int jc = off[i] + k;
          if (jc < 0 || jc > t_len) continue;
          float bM = B.M[(size_t)i * W + k];
          float bD = B.D[(size_t)i * W + k];
          double term = 0;
          for (int u = 0; u <= c; ++u)
            term += (double)Mb[u][(size_t)i * W + k] * bM * cU2[u] +
                    (double)Db[u][(size_t)i * W + k] * bD * cU2[u];
          acc[(size_t)jc * NUM_EDIT + 8 + c - 1] += term;
        }
      }
    }
  }
  out_tab->assign((size_t)TC * NUM_EDIT, -1e30f);
  for (int j = 0; j < TC; ++j) {
    for (int e = 0; e < NUM_EDIT; ++e) {
      bool ok;
      if (e < 4) ok = j < t_len;
      else if (e < 8) ok = j <= t_len;
      else if (e < 8 + COPY_SIZE) ok = j + (e - 8 + 1) <= t_len &&
                                      j + (e - 8 + 1) - 1 < t_len;
      else ok = j + (e - 8 - COPY_SIZE + 1) <= t_len;
      if (!ok) continue;
      double v = acc[(size_t)j * NUM_EDIT + e];
      (*out_tab)[(size_t)j * NUM_EDIT + e] =
          std::log(std::max(v, (double)EPS)) + F.lk;
    }
  }
  // copy rows were accumulated at their anchor column J=j+c: shift to j
  for (int c = 1; c <= COPY_SIZE; ++c) {
    int col = 8 + c - 1;
    for (int j = 0; j < TC; ++j) {
      int J = j + c;
      (*out_tab)[(size_t)j * NUM_EDIT + col] =
          (J < TC && j + c <= t_len)
              ? std::log(std::max(acc[(size_t)J * NUM_EDIT + col],
                                  (double)EPS)) + F.lk
              : -1e30f;
    }
  }
  // deleting a block that ends the template
  for (int d = 1; d <= DEL_SIZE; ++d) {
    int j = t_len - d;
    if (j < 0) continue;
    // LK = forward sum at (q_len, t_len - d)
    int ke = (t_len - d) - off[q_len];
    float fin = 0.f;
    if (ke >= 0 && ke < W)
      fin = F.M[(size_t)q_len * W + ke] + F.I[(size_t)q_len * W + ke] +
            F.D[(size_t)q_len * W + ke];
    (*out_tab)[(size_t)j * NUM_EDIT + 8 + COPY_SIZE + d - 1] =
        std::log(fin + EPS) + F.cum[q_len];
  }
}

void read_modtable(const uint8_t* q, int q_len,
                   const std::vector<uint8_t>& tpl, const Params& P, int W,
                   float* lk_out, std::vector<float>* tab) {
  Banded F, B;
  forward_banded(q, q_len, tpl.data(), (int)tpl.size(), P, W, &F);
  backward_banded(q, q_len, tpl.data(), (int)tpl.size(), P, F.off, W, &B);
  *lk_out = F.lk;
  modification_table(q, q_len, tpl.data(), (int)tpl.size(), P, W, F, B, tab);
}

// -------- polish: summed gains -> spaced edits -> apply --------

struct Edit { int pos; int code; float gain; };

std::vector<Edit> choose_edits(const std::vector<double>& total, int t_len,
                               float min_gain, int spacing) {
  int TC = t_len + 2;
  std::vector<std::pair<float, int>> best(TC);
  for (int j = 0; j < TC; ++j) {
    float bg = -1e30f;
    int be = 0;
    for (int e = 0; e < NUM_EDIT; ++e) {
      float v = (float)total[(size_t)j * NUM_EDIT + e];
      if (v > bg) { bg = v; be = e; }
    }
    best[j] = {bg, be};
  }
  std::vector<int> order(TC);
  for (int j = 0; j < TC; ++j) order[j] = j;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return best[a].first > best[b].first; });
  std::vector<bool> used(TC + spacing + 2, false);
  std::vector<Edit> out;
  for (int j : order) {
    if (best[j].first <= min_gain) break;
    bool clash = false;
    for (int x = std::max(0, j - spacing);
         x <= std::min(TC - 1, j + spacing); ++x)
      if (used[x]) { clash = true; break; }
    if (clash) continue;
    used[j] = true;
    out.push_back({j, best[j].second, best[j].first});
  }
  return out;
}

std::vector<uint8_t> apply_edits(const std::vector<uint8_t>& t,
                                 std::vector<Edit> edits) {
  std::sort(edits.begin(), edits.end(),
            [](const Edit& a, const Edit& b) { return a.pos > b.pos; });
  std::vector<uint8_t> out(t);
  for (const auto& e : edits) {
    int j = e.pos, c = e.code;
    if (j > (int)out.size()) continue;
    if (c < 4) {
      if (j < (int)out.size()) out[j] = (uint8_t)c;
    } else if (c < 8) {
      out.insert(out.begin() + j, (uint8_t)(c - 4));
    } else if (c < 8 + COPY_SIZE) {
      int cl = c - 8 + 1;
      if (j + cl <= (int)out.size())
        out.insert(out.begin() + j + cl, out.begin() + j, out.begin() + j + cl);
    } else {
      int d = c - 8 - COPY_SIZE + 1;
      if (j + d <= (int)out.size())
        out.erase(out.begin() + j, out.begin() + j + d);
    }
  }
  return out;
}

// -------- clustering: kmeans++ + Metropolis (production effort) --------

// Incremental aggregates (mirrors the reference's LKCount table: flips
// update O(V), the gated objective recomputes from aggregates O(K*V) per
// proposal — pseudo_mcmc.rs:704-762, get_lk/:847-869).
struct Aggr {
  int K, V;
  std::vector<double> gain, pos, neg;
  std::vector<int> counts;
  std::vector<double> size_lk;  // Poisson cluster-size prior
  void init(const std::vector<float>& X, const std::vector<int>& asn, int R,
            int K_, int V_) {
    K = K_; V = V_;
    gain.assign((size_t)K * V, 0);
    pos.assign((size_t)K * V, 0);
    neg.assign((size_t)K * V, 0);
    counts.assign(K, 0);
    size_lk.assign(R + 1, 0);
    double lam = (double)R / std::max(K, 1);
    double lg = 0;
    for (int n = 0; n <= R; ++n) {
      if (n > 0) lg += std::log((double)n);
      size_lk[n] = n * std::log(std::max(lam, 1e-9)) - lam - lg;
    }
    for (int r0 = 0; r0 < R; ++r0) add(X, r0, asn[r0], +1);
  }
  void add(const std::vector<float>& X, int r0, int a, int sgn) {
    counts[a] += sgn;
    for (int v = 0; v < V; ++v) {
      float x = X[(size_t)r0 * V + v];
      gain[(size_t)a * V + v] += sgn * (double)x;
      if (x > 1e-5f) pos[(size_t)a * V + v] += sgn;
      if (x < -1e-5f) neg[(size_t)a * V + v] += sgn;
    }
  }
  double objective() const {
    double sc = 0;
    for (int v = 0; v < V; ++v) {
      bool informative = false;
      double pos_use = 0, pos_neg = 0;
      for (int kk = 0; kk < K; ++kk) {
        double g = gain[(size_t)kk * V + v];
        double p = pos[(size_t)kk * V + v], n = neg[(size_t)kk * V + v];
        if (g > 0 && p > 0.70 * (p + n + 1e-7)) informative = true;
        if (g > 0) pos_use += p; else pos_neg += p;
      }
      if (!informative || pos_neg * 2.0 >= pos_use) continue;
      for (int kk = 0; kk < K; ++kk) {
        double g = gain[(size_t)kk * V + v];
        if (g > 0) sc += g;
      }
    }
    for (int kk = 0; kk < K; ++kk)
      sc += size_lk[std::min(std::max(counts[kk], 0),
                             (int)size_lk.size() - 1)];
    return sc;
  }
};

struct ClusterResult { double score; std::vector<int> asn; };

ClusterResult cluster_mcmc(const std::vector<float>& X, int R, int V, int K,
                           int restarts, int flips_per_read,
                           std::mt19937_64* rng) {
  ClusterResult best{-1e18, {}};
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int rs = 0; rs < restarts; ++rs) {
    // kmeans++ init
    std::vector<int> asn(R, 0);
    if (R > 0) {
      std::vector<int> centers;
      centers.push_back((int)((*rng)() % R));
      std::vector<double> d2(R, 1e18);
      while ((int)centers.size() < K) {
        double tot = 0;
        for (int r0 = 0; r0 < R; ++r0) {
          double dd = 0;
          int c = centers.back();
          for (int v = 0; v < V; ++v) {
            double df = X[(size_t)r0 * V + v] - X[(size_t)c * V + v];
            dd += df * df;
          }
          d2[r0] = std::min(d2[r0], dd);
          tot += d2[r0];
        }
        double pick = uni(*rng) * (tot + 1e-12);
        int chosen = R - 1;
        double run = 0;
        for (int r0 = 0; r0 < R; ++r0) {
          run += d2[r0];
          if (run >= pick) { chosen = r0; break; }
        }
        centers.push_back(chosen);
      }
      for (int r0 = 0; r0 < R; ++r0) {
        double bd = 1e30;
        for (int kk = 0; kk < K; ++kk) {
          double dd = 0;
          int c = centers[kk];
          for (int v = 0; v < V; ++v) {
            double df = X[(size_t)r0 * V + v] - X[(size_t)c * V + v];
            dd += df * df;
          }
          if (dd < bd) { bd = dd; asn[r0] = kk; }
        }
      }
    }
    Aggr ag;
    ag.init(X, asn, R, K, V);
    double cur = ag.objective();
    int steps = flips_per_read * std::max(R, 1);
    for (int t = 0; t < steps; ++t) {
      int r0 = (int)((*rng)() % std::max(R, 1));
      int nk = (int)((*rng)() % K);
      if (nk == asn[r0]) continue;
      int old = asn[r0];
      ag.add(X, r0, old, -1);
      ag.add(X, r0, nk, +1);
      double nxt = ag.objective();
      double dlt = nxt - cur;
      if (dlt >= 0 || uni(*rng) < std::exp(dlt)) {
        asn[r0] = nk;
        cur = nxt;
      } else {
        ag.add(X, r0, nk, -1);
        ag.add(X, r0, old, +1);
      }
    }
    if (cur > best.score) best = {cur, asn};
  }
  return best;
}

// -------- per-chunk pipeline --------

void phase_chunk(std::vector<uint8_t> tpl,
                 const std::vector<std::vector<uint8_t>>& reads,
                 const Params& P, int W, int restarts, int flips,
                 std::mt19937_64* rng, int* out_k) {
  int R = (int)reads.size();
  // 1. polish (<=6 rounds)
  for (int round = 0; round < 6; ++round) {
    int TC = (int)tpl.size() + 2;
    std::vector<double> total((size_t)TC * NUM_EDIT, 0.0);
    std::vector<float> tab;
    for (const auto& q : reads) {
      float lk;
      read_modtable(q.data(), (int)q.size(), tpl, P, W, &lk, &tab);
      for (size_t x = 0; x < total.size() && x < tab.size(); ++x)
        total[x] += (tab[x] < -1e29f) ? -1e30 : (double)(tab[x] - lk);
    }
    auto edits = choose_edits(total, (int)tpl.size(), 0.1f, 8);
    if (edits.empty()) break;
    tpl = apply_edits(tpl, edits);
  }
  // 2. profile pass: per-read gains, variant columns = top 96 by total gain
  int TC = (int)tpl.size() + 2;
  std::vector<std::vector<float>> profs(R);
  std::vector<double> total((size_t)TC * NUM_EDIT, 0.0);
  std::vector<float> tab;
  for (int r0 = 0; r0 < R; ++r0) {
    float lk;
    read_modtable(reads[r0].data(), (int)reads[r0].size(), tpl, P, W, &lk,
                  &tab);
    profs[r0].resize(tab.size());
    for (size_t x = 0; x < tab.size(); ++x) {
      float g = (tab[x] < -1e29f) ? 0.f : tab[x] - lk;
      profs[r0][x] = g;
      total[x] += g;
    }
  }
  std::vector<int> cols;
  {
    std::vector<std::pair<double, int>> ranked;
    for (size_t x = 0; x < total.size(); ++x)
      if (total[x] > 1.0) ranked.push_back({total[x], (int)x});
    std::sort(ranked.begin(), ranked.end(),
              [](auto& a, auto& b) { return a.first > b.first; });
    for (size_t i = 0; i < ranked.size() && i < 96; ++i)
      cols.push_back(ranked[i].second);
  }
  int V = (int)cols.size();
  *out_k = 1;
  if (V == 0 || R < 4) return;
  std::vector<float> X((size_t)R * V);
  for (int r0 = 0; r0 < R; ++r0)
    for (int v = 0; v < V; ++v) X[(size_t)r0 * V + v] = profs[r0][cols[v]];
  auto res = cluster_mcmc(X, R, V, 2, restarts, flips, rng);
  // accept k=2 when the best 2-cluster score beats all-in-one
  std::vector<int> one(R, 0);
  Aggr a1;
  a1.init(X, one, R, 2, V);
  *out_k = res.score > a1.objective() ? 2 : 1;
}

// -------- selftest --------

int selftest() {
  Params P;
  std::mt19937_64 rng(7);
  double worst_exact = 0, worst_copy = 0;
  for (int iter = 0; iter < 8; ++iter) {
    int T = 40, W = 24;
    std::vector<uint8_t> tpl(T);
    for (auto& c : tpl) c = rng() % 4;
    // read = template with a few errors
    std::vector<uint8_t> q(tpl);
    for (int e = 0; e < 3; ++e) q[rng() % q.size()] = rng() % 4;
    float lk;
    std::vector<float> tab;
    read_modtable(q.data(), (int)q.size(), tpl, P, W, &lk, &tab);
    // brute force: re-forward each edited template
    for (int j = 0; j <= T; ++j) {
      for (int e = 0; e < NUM_EDIT; ++e) {
        float got = tab[(size_t)j * NUM_EDIT + e];
        if (got < -1e29f) continue;
        std::vector<uint8_t> t2 = apply_edits(tpl, {{j, e, 0.f}});
        Banded F2;
        forward_banded(q.data(), (int)q.size(), t2.data(), (int)t2.size(), P,
                       W, &F2);
        double diff = std::fabs(got - F2.lk);
        if (e >= 8 && e < 8 + COPY_SIZE && (e - 8 + 1) >= 2)
          worst_copy = std::max(worst_copy, diff);
        else
          worst_exact = std::max(worst_exact, diff);
      }
    }
  }
  std::printf("{\"selftest\": true, \"worst_exact\": %.5f, "
              "\"worst_copy\": %.5f}\n", worst_exact, worst_copy);
  return (worst_exact < 2e-2 && worst_copy < 1.0) ? 0 : 1;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc >= 2 && std::strcmp(argv[1], "--selftest") == 0)
    return selftest();
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s pileups.bin [restarts flips]\n", argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", argv[1]); return 2; }
  int restarts = argc > 2 ? std::atoi(argv[2]) : 20;
  int flips = argc > 3 ? std::atoi(argv[3]) : 2000;
  auto rd_u32 = [&]() {
    uint32_t v = 0;
    if (std::fread(&v, 4, 1, f) != 1) { std::fclose(f); std::exit(3); }
    return v;
  };
  uint32_t n_chunks = rd_u32();
  std::vector<std::vector<uint8_t>> templates(n_chunks);
  std::vector<std::vector<std::vector<uint8_t>>> pileups(n_chunks);
  size_t n_reads = 0;
  for (uint32_t c = 0; c < n_chunks; ++c) {
    uint32_t tl = rd_u32();
    templates[c].resize(tl);
    if (std::fread(templates[c].data(), 1, tl, f) != tl) return 3;
    uint32_t R = rd_u32();
    pileups[c].resize(R);
    n_reads += R;
    for (uint32_t r = 0; r < R; ++r) {
      uint32_t ql = rd_u32();
      pileups[c][r].resize(ql);
      if (std::fread(pileups[c][r].data(), 1, ql, f) != ql) return 3;
    }
  }
  std::fclose(f);
  Params P;
  std::mt19937_64 rng(42);
  auto t0 = std::chrono::steady_clock::now();
  int phased = 0;
  for (uint32_t c = 0; c < n_chunks; ++c) {
    int k = 1;
    phase_chunk(templates[c], pileups[c], P, 128, restarts, flips, &rng, &k);
    phased += (k > 1);
  }
  double secs = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0).count();
  std::printf("{\"chunks\": %u, \"reads\": %zu, \"phased\": %d, "
              "\"seconds\": %.3f, \"chunks_per_s\": %.4f, "
              "\"restarts\": %d, \"flips_per_read\": %d}\n",
              n_chunks, n_reads, phased, secs,
              n_chunks / std::max(secs, 1e-9), restarts, flips);
  return 0;
}
