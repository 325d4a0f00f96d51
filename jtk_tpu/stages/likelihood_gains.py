"""Gain calibration: expected LK gain and null probability of true variants.

Reference: ``haplotyper/src/likelihood_gains.rs`` — simulates reads through the
trained HMM to estimate, per difference type, (a) the expected likelihood gain
a true variant confers on a carrying read (``estimate_gain`` :162-192) and
(b) the probability that a non-carrying read still shows positive gain, used
for binomial-tail p-values of variant columns (:115-129).

Here the simulation reuses the dataset error profile + the K2 kernel: plant
edits in random templates, draw noisy reads, and read the gains straight off
the modification table.  (Round-1 simplification: calibrated per difference
type; the reference additionally conditions on homopolymer length, which is
approximated by the hard homopolymer-length<=2 filter in local_clustering.)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..datamodel import ErrorRate
from ..ops.banded_align import linear_offsets
from ..ops.modtable import modification_table_pileup
from ..ops.phmm import PHMMParams

DIFF_TYPES = ("sub", "del", "ins")


@dataclass
class Gains:
    expected: dict  # difftype -> mean gain on carrying reads
    null_prob: dict  # difftype -> P(gain > thr) on non-carrying reads
    thr: float = 0.5

    def expected_of(self, difftype: str) -> float:
        return self.expected[difftype]

    def pvalue(self, difftype: str, count: int, total: int) -> float:
        """Binomial tail P(X >= count | total, null_prob)."""
        p = max(self.null_prob[difftype], 1e-4)
        # survival function via log accumulation (counts are small)
        from math import comb, log
        if count <= 0:
            return 1.0
        s = 0.0
        for x in range(count, total + 1):
            s += comb(total, x) * p ** x * (1 - p) ** (total - x)
            if s > 1.0:
                return 1.0
        return min(s, 1.0)


def _noisy(rng, template, er: ErrorRate):
    out = []
    for b in template:
        x = rng.random()
        if x < er.del_:
            continue
        if x < er.del_ + er.mismatch:
            out.append((b + 1 + rng.integers(0, 3)) % 4)
        else:
            out.append(b)
        if rng.random() < er.ins:
            out.append(rng.integers(0, 4))
    return np.array(out, dtype=np.int8)


def estimate_gains(params: PHMMParams, error_rate: ErrorRate,
                   seed: int = 42, n_templates: int = 2, n_reads: int = 16,
                   tlen: int = 200, W: int = 64) -> Gains:
    rng = np.random.default_rng(seed)
    gains = {d: [] for d in DIFF_TYPES}
    nulls = {d: [] for d in DIFF_TYPES}
    thr = 0.5
    Tpad = tlen + 32
    for _ in range(n_templates):
        tpl = rng.integers(0, 4, tlen).astype(np.int8)
        jpos = tlen // 2
        edited = {
            "sub": np.concatenate([tpl[:jpos], [(tpl[jpos] + 1) % 4], tpl[jpos + 1:]]),
            "del": np.concatenate([tpl[:jpos], tpl[jpos + 1:]]),
            "ins": np.concatenate([tpl[:jpos], [rng.integers(0, 4)], tpl[jpos:]]),
        }
        edit_col = {
            "sub": (jpos, int((tpl[jpos] + 1) % 4)),
            "del": (jpos, 4),
            "ins": (jpos, 5 + int(edited["ins"][jpos])),
        }
        for dt in DIFF_TYPES:
            reads = [_noisy(rng, edited[dt].astype(np.int8), error_rate)
                     for _ in range(n_reads)]
            Qpad = ((max(len(r) for r in reads) + 63) // 64) * 64
            qs = np.full((n_reads, Qpad), 4, np.int8)
            for i, r in enumerate(reads):
                qs[i, :len(r)] = r
            qlens = np.array([len(r) for r in reads], np.int32)
            offs = np.stack([linear_offsets(int(l), tlen, Qpad, W) for l in qlens])
            lk, tab = modification_table_pileup(
                qs, np.concatenate([tpl, np.full(Tpad - tlen, 4, np.int8)]),
                offs, qlens, np.int32(tlen), params, W, Tpad)
            lk = np.asarray(lk)
            tab = np.asarray(tab)
            j, e = edit_col[dt]
            g = tab[:, j, e] - lk
            gains[dt].extend(g.tolist())
            # null: gains at far-away positions of the same edit type
            for joff in (-40, -25, 25, 40):
                jn = jpos + joff
                en = {"sub": (tpl[jn] + 1) % 4, "del": 4, "ins": 5}[dt]
                nulls[dt].extend((tab[:, jn, int(en)] - lk > thr).tolist())
    expected = {d: float(np.clip(np.mean(gains[d]), 0.5, None)) for d in DIFF_TYPES}
    null_prob = {d: float(np.clip(np.mean(nulls[d]), 1e-3, 0.5)) for d in DIFF_TYPES}
    return Gains(expected, null_prob, thr)
