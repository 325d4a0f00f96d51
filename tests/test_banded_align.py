"""K3 banded alignment vs unbanded NumPy oracle (property tests)."""

import numpy as np
import pytest

from jtk_tpu.ops import oracle
from jtk_tpu.ops.banded_align import (
    banded_align_batch, diagonal_offsets, edit_align, linear_offsets, ops_rle,
    traceback_batch,
)


def _mutate(rng, seq, err):
    """Apply random sub/ins/del at rate err; returns mutated copy."""
    out = []
    for b in seq:
        r = rng.random()
        if r < err / 3:
            continue  # deletion
        if r < 2 * err / 3:
            out.append(rng.integers(0, 4))  # substitution (may be same)
            continue
        if r < err:
            out.append(b)
            out.append(rng.integers(0, 4))  # insertion after
            continue
        out.append(b)
    return np.array(out, dtype=np.int8)


def _check_cigar(q, r, cigar, score, ref_start, ref_end):
    """CIGAR must consume exactly q and r[ref_start:ref_end] and cost == score."""
    qi, rj, cost = 0, ref_start, 0
    for k, l in cigar:
        if k == "M":
            cost += int(np.sum(q[qi:qi + l] != r[rj:rj + l]))
            qi += l
            rj += l
        elif k == "I":
            cost += l
            qi += l
        else:
            cost += l
            rj += l
    assert qi == len(q)
    assert rj == ref_end
    assert cost == score, (cost, score)


@pytest.mark.parametrize("err", [0.0, 0.05, 0.15])
def test_global_matches_oracle(err):
    rng = np.random.default_rng(0)
    for trial in range(5):
        r = rng.integers(0, 4, size=300).astype(np.int8)
        q = _mutate(rng, r, err)
        score, cigar, rs, re = edit_align(q, r, W=128, mode="global")
        oscore, _, _, _ = oracle.edit_dp(q, r, "global")
        assert score == oscore, (err, trial)
        _check_cigar(q, r, cigar, score, rs, re)
        assert rs == 0 and re == len(r)


@pytest.mark.parametrize("err", [0.0, 0.10])
def test_infix_matches_oracle(err):
    rng = np.random.default_rng(1)
    for trial in range(5):
        r = rng.integers(0, 4, size=500).astype(np.int8)
        start = int(rng.integers(0, 150))
        q = _mutate(rng, r[start:start + 200], err)
        score, cigar, rs, re = edit_align(q, r, W=256, mode="infix", diag=start)
        oscore, _, _, _ = oracle.edit_dp(q, r, "infix")
        assert score == oscore, (err, trial, score, oscore)
        _check_cigar(q, r, cigar, score, rs, re)


def test_batch_variable_lengths():
    rng = np.random.default_rng(2)
    W, Q, T = 128, 260, 280
    qs, rs_arr, offs, qls, tls = [], [], [], [], []
    pairs = []
    for _ in range(6):
        tl = int(rng.integers(150, 260))
        r = rng.integers(0, 4, size=tl).astype(np.int8)
        q = _mutate(rng, r, 0.08)
        ql = len(q)
        pairs.append((q, r))
        qp = np.full(Q, 4, np.int8); qp[:ql] = q
        rp = np.full(T, 4, np.int8); rp[:tl] = r
        qs.append(qp); rs_arr.append(rp)
        offs.append(linear_offsets(ql, tl, Q, W))
        qls.append(ql); tls.append(tl)
    res = banded_align_batch(np.stack(qs), np.stack(rs_arr), np.stack(offs),
                             np.array(qls), np.array(tls), W, "global")
    ops, ref_starts = traceback_batch(res["ptrs"], np.stack(offs), np.array(qls),
                                      res["end_j"], "global")
    for b, (q, r) in enumerate(pairs):
        oscore, _, _, _ = oracle.edit_dp(q, r, "global")
        assert int(res["score"][b]) == oscore
        _check_cigar(q, r, ops_rle(ops[b]), int(res["score"][b]),
                     int(ref_starts[b]), int(res["end_j"][b]))


def test_device_traceback_matches_host():
    from jtk_tpu.ops.banded_align import align_with_cigar_batch
    rng = np.random.default_rng(5)
    for mode, W in (("global", 128), ("infix", 128)):
        qs, rs_arr, offs, qls, tls, pairs = [], [], [], [], [], []
        Q, T = 200, 320
        for _ in range(5):
            r = rng.integers(0, 4, size=T).astype(np.int8)
            if mode == "global":
                q = _mutate(rng, r[:180], 0.1)
                off = linear_offsets(len(q), 180, Q, W)
                tl = 180
            else:
                start = int(rng.integers(0, 80))
                q = _mutate(rng, r[start:start + 150], 0.1)
                off = diagonal_offsets(len(q), start, T, Q, W)
                tl = T
            qp = np.full(Q, 4, np.int8); qp[:len(q)] = q
            rp = np.full(T, 4, np.int8); rp[:tl] = r[:tl]
            qs.append(qp); rs_arr.append(rp); offs.append(off)
            qls.append(len(q)); tls.append(tl); pairs.append((q, r[:tl]))
        res = align_with_cigar_batch(np.stack(qs), np.stack(rs_arr),
                                     np.stack(offs), np.array(qls),
                                     np.array(tls), W, mode)
        for b, (q, r) in enumerate(pairs):
            _check_cigar(q, r, res["cigar"][b], int(res["score"][b]),
                         int(res["start_j"][b]), int(res["end_j"][b]))
            oscore, _, _, _ = oracle.edit_dp(q, r, mode)
            assert int(res["score"][b]) == oscore, (mode, b)


def test_long_deletion_run_no_uint8_wrap():
    """Regression (ADVICE r1): a contiguous deletion run >255 bp must survive
    the device traceback intact — run lengths were uint8 and wrapped."""
    from jtk_tpu.ops.banded_align import align_with_cigar_batch
    rng = np.random.default_rng(9)
    W = 512
    r = rng.integers(0, 4, size=900).astype(np.int8)
    q = np.concatenate([r[:250], r[250 + 400:]])  # 400 bp deletion
    Q = 520
    off = linear_offsets(len(q), len(r), Q, W)
    qp = np.full(Q, 4, np.int8); qp[:len(q)] = q
    res = align_with_cigar_batch(qp[None], r[None], off[None],
                                 np.array([len(q)]), np.array([len(r)]),
                                 W, "global")
    assert int(res["score"][0]) == 400
    _check_cigar(q, r, res["cigar"][0], 400, 0, len(r))
    # the uint8 wrap produced cost 402 != score with a phantom 1bp insertion;
    # co-optimal fragmentation of the run is fine, phantom I/M costs are not
    assert not any(k == "I" for k, _ in res["cigar"][0]), res["cigar"][0]
    assert sum(l for k, l in res["cigar"][0] if k == "D") == 400


def test_band_offsets_shapes():
    off = linear_offsets(100, 120, 140, 64)
    assert off.shape == (141,)
    assert off[0] == 0
    d = np.diff(off)
    assert ((d == 0) | (d == 1)).all()
    assert off[100] <= 120 <= off[100] + 63
    off2 = diagonal_offsets(100, 50, 400, 120, 64)
    d2 = np.diff(off2)
    assert ((d2 == 0) | (d2 == 1)).all()


def test_packed_dispatch_matches_dense():
    """2-bit packed transfer path is bit-exact vs the dense dispatch; inputs
    that violate the packing preconditions (non-ACGT codes inside the live
    span) silently take the dense route."""
    from jtk_tpu.ops.banded_align import (_banded_align_cigar_batch,
                                          align_with_cigar_batch)
    rng = np.random.default_rng(11)
    W = 128
    B, Q, T = 4, 256, 280
    qs = np.full((B, Q), 4, np.int8)
    rs = np.full((B, T), 4, np.int8)
    q_lens = np.zeros(B, np.int32)
    t_lens = np.zeros(B, np.int32)
    offs = np.zeros((B, Q + 1), np.int32)
    for b in range(B):
        t = rng.integers(0, 4, size=int(rng.integers(200, Q))).astype(np.int8)
        q = t.copy()
        q[rng.integers(0, len(q), 5)] = rng.integers(0, 4, 5)
        rs[b, :len(t)] = t
        qs[b, :len(q)] = q
        q_lens[b], t_lens[b] = len(q), len(t)
        offs[b] = linear_offsets(len(q), len(t), Q, W)
    res = align_with_cigar_batch(qs, rs, offs, q_lens, t_lens, W, "global")
    import jax.numpy as jnp
    meta, _, _ = _banded_align_cigar_batch(
        jnp.asarray(qs), jnp.asarray(rs), jnp.asarray(offs),
        jnp.asarray(q_lens), jnp.asarray(t_lens), W, "global")
    assert (np.asarray(meta)[:, 0] == np.asarray(res["score"])).all()
    # degenerate code 4 inside the live span -> dense fallback, still correct
    qs2 = qs.copy()
    qs2[0, 10] = 4
    res2 = align_with_cigar_batch(qs2, rs, offs, q_lens, t_lens, W, "global")
    assert res2["score"][0] >= res["score"][0]
