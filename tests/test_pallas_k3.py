"""Pallas K3 (banded edit DP + packed traceback) vs the XLA scan engine:
decoded results must match candidate-for-candidate (interpret mode)."""

import numpy as np

from jtk_tpu.ops import banded_align as ba
from jtk_tpu.ops.pallas_k3 import pallas_extend_hostwin


def _mk_batch(rng, B=16, clen=384, W=128, margin=60):
    Qpad = ((clen + 127) // 128) * 128
    NC = 8
    chunks_blob = np.full((NC, Qpad), 4, np.int8)
    chunk_lens = np.zeros(NC, np.int32)
    for c in range(NC):
        L = clen - int(rng.integers(0, 30))
        chunks_blob[c, :L] = rng.integers(0, 4, L)
        chunk_lens[c] = L
    Tpad = ((clen + 2 * margin + 127) // 128) * 128
    cand = rng.integers(0, NC, B).astype(np.int32)
    rs = np.zeros((B, Tpad), np.int8)
    t_lens = np.ones(B, np.int32)
    ws = np.zeros(B, np.int32)
    astart = np.zeros(B, np.int32)
    for b in range(B):
        L = int(chunk_lens[cand[b]])
        c = chunks_blob[cand[b], :L].copy()
        # mutate ~6%
        m = rng.random(L) < 0.04
        c[m] = (c[m] + 1 + rng.integers(0, 3, m.sum())) % 4
        ins = rng.random(L) < 0.01
        seq = []
        for i in range(L):
            if not (rng.random() < 0.01):   # 1% del
                seq.append(c[i])
            if ins[i]:
                seq.append(rng.integers(0, 4))
        seq = np.array(seq, np.int8)
        win = np.concatenate([rng.integers(0, 4, margin).astype(np.int8),
                              seq,
                              rng.integers(0, 4, margin).astype(np.int8)])
        win = win[:Tpad]
        rs[b, :len(win)] = win
        t_lens[b] = len(win)
    return (chunks_blob, chunk_lens, cand, rs, ws, astart, t_lens,
            W, Qpad, Tpad, margin)


def test_pallas_k3_matches_scan_engine():
    rng = np.random.default_rng(2)
    (blob, clens, cand, rs, ws, astart, t_lens,
     W, Qpad, Tpad, margin) = _mk_batch(rng)
    args = (blob, clens, cand, ba.pack2bit(rs), ws, astart, t_lens,
            W, Qpad, Tpad, margin)
    want = ba._extend_hostwin(*args)
    got = pallas_extend_hostwin(*args, interpret=True)
    q_lens = [int(clens[c]) for c in cand]
    dec_w = ba.decode_indexed(*[np.asarray(x) for x in want], q_lens)
    dec_g = ba.decode_indexed(*[np.asarray(x) for x in got], q_lens)
    for b, (w, g) in enumerate(zip(dec_w, dec_g)):
        ws_, gs = w, g
        assert gs[0] == ws_[0], (b, "score", gs[0], ws_[0])
        assert gs[4] == ws_[4], (b, "valid")
        if not ws_[4]:
            continue
        assert gs[1] == ws_[1], (b, "start", gs[1], ws_[1])
        assert gs[2] == ws_[2], (b, "end")
        assert gs[3] == ws_[3], (b, "cigar")
