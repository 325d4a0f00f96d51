"""Native gotoh_skel parity: the threaded C++ pair DP must reproduce the
numpy batch path (_gotoh_batch + filters) pair-for-pair — same pass set,
same merged RLE ops (scores/tie-breaking/traceback preferences are
replicated exactly for passing pairs)."""

import numpy as np
import pytest

from jtk_tpu.native_ext import gotoh_skel_native
from jtk_tpu.stages.deletion_fill import (MIN_MATCH, SCORE_THR, _gotoh_batch,
                                          _is_proper, _rev_skeleton)


def _random_skels(rng, n_reads, max_len=24, n_chunks=12):
    skels = []
    for _ in range(n_reads):
        n = int(rng.integers(1, max_len))
        ch = rng.integers(0, n_chunks, n).astype(np.int64)
        cl = rng.integers(0, 3, n).astype(np.int64)
        dr = rng.integers(0, 2, n).astype(bool)
        po = np.full(n, -(10 ** 9), np.int64)
        ao = np.full(n, -(10 ** 9), np.int64)
        skels.append((ch, cl, dr, po, ao))
    return skels


def _numpy_reference(skels, pairs):
    """The pre-native batch path: padded numpy DP + host filters."""
    out = {}
    L = max(max(len(skels[r][0]) for r, _q, _d in pairs),
            max(len(skels[q][0]) for _r, q, _d in pairs))
    B = len(pairs)
    rc = np.full((B, L), -1, np.int64)
    rl = np.zeros((B, L), np.int64)
    rd = np.zeros((B, L), bool)
    qc = np.full((B, L), -1, np.int64)
    ql_ = np.zeros((B, L), np.int64)
    qd = np.zeros((B, L), bool)
    r_lens = np.zeros(B, np.int64)
    q_lens = np.zeros(B, np.int64)
    for b, (ri, qi, is_fwd) in enumerate(pairs):
        ch, cl, dr, _po, _ao = skels[ri]
        rc[b, :len(ch)], rl[b, :len(ch)], rd[b, :len(ch)] = ch, cl, dr
        r_lens[b] = len(ch)
        qs = skels[qi] if is_fwd else _rev_skeleton(skels[qi])
        qch, qcl, qdr, _p, _a = qs
        qc[b, :len(qch)], ql_[b, :len(qch)], qd[b, :len(qch)] = qch, qcl, qdr
        q_lens[b] = len(qch)
    scores, ops_list = _gotoh_batch((rc, rl, rd), (qc, ql_, qd),
                                    r_lens, q_lens, L)
    for b in range(B):
        ops = ops_list[b]
        match_num = sum(l for k, l in ops if k == "M")
        min_match = min(MIN_MATCH, int(r_lens[b]), int(q_lens[b]))
        ok = (match_num >= min_match and scores[b] >= SCORE_THR
              and _is_proper(ops))
        out[b] = (ok, ops if ok else None)
    return out


def _native(skels, pairs):
    n_reads = len(skels)
    offs = np.zeros(n_reads + 1, np.int64)
    for i, sk in enumerate(skels):
        offs[i + 1] = offs[i] + len(sk[0])
    ch = np.concatenate([sk[0] for sk in skels]).astype(np.int32)
    cl = np.concatenate([sk[1] for sk in skels]).astype(np.int32)
    dr = np.concatenate([sk[2] for sk in skels]).astype(np.uint8)
    parr = np.asarray([(r, q, 1 if f else 0) for r, q, f in pairs], np.int32)
    res = gotoh_skel_native(ch, cl, dr, offs, parr, MIN_MATCH, SCORE_THR)
    if res is None:
        pytest.skip("native gotoh_skel unavailable")
    passed, kinds, lens, starts, counts = res
    km = {1: "M", 2: "I", 3: "D"}
    out = {}
    for p in range(len(pairs)):
        if passed[p]:
            s0, n = int(starts[p]), int(counts[p])
            out[p] = (True, [(km[int(kinds[s0 + t])], int(lens[s0 + t]))
                             for t in range(n)])
        else:
            out[p] = (False, None)
    return out


def test_native_matches_numpy_random():
    rng = np.random.default_rng(7)
    skels = _random_skels(rng, 40)
    pairs = []
    for _ in range(400):
        ri, qi = rng.integers(0, len(skels), 2)
        if ri == qi:
            continue
        pairs.append((int(ri), int(qi), bool(rng.integers(0, 2))))
    ref = _numpy_reference(skels, pairs)
    nat = _native(skels, pairs)
    n_pass = sum(1 for ok, _ in ref.values() if ok)
    assert n_pass > 5  # the fixture must actually exercise passing pairs
    for b in range(len(pairs)):
        assert nat[b] == ref[b], f"pair {b}: {nat[b]} != {ref[b]}"


def test_native_matches_numpy_structured():
    """Pairs built from a shared backbone (realistic: high-identity reads
    with dropped nodes) — exercises long M runs, leading/trailing free gaps
    and interior deletions."""
    rng = np.random.default_rng(11)
    backbone_ch = rng.integers(0, 30, 30).astype(np.int64)
    backbone_cl = rng.integers(0, 2, 30).astype(np.int64)
    backbone_dr = rng.integers(0, 2, 30).astype(bool)
    skels = []
    for _ in range(30):
        s = int(rng.integers(0, 10))
        e = int(rng.integers(s + 3, 31))
        keep = rng.random(e - s) > 0.15   # drop ~15% of nodes
        ch, cl, dr = (backbone_ch[s:e][keep], backbone_cl[s:e][keep],
                      backbone_dr[s:e][keep])
        n = len(ch)
        skels.append((ch, cl, dr, np.full(n, -1, np.int64),
                      np.full(n, -1, np.int64)))
    pairs = [(i, j, bool((i + j) % 2 == 0))
             for i in range(0, 30, 3) for j in range(30) if i != j]
    ref = _numpy_reference(skels, pairs)
    nat = _native(skels, pairs)
    n_pass = sum(1 for ok, _ in ref.values() if ok)
    assert n_pass > 50
    for b in range(len(pairs)):
        assert nat[b] == ref[b], f"pair {b}: {nat[b]} != {ref[b]}"
