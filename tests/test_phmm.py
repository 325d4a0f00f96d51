"""K1 pair-HMM banded forward/backward vs scalar oracle."""

import numpy as np
import pytest

from jtk_tpu.datamodel import HMMParam
from jtk_tpu.ops import oracle
from jtk_tpu.ops.banded_align import linear_offsets
from jtk_tpu.ops.phmm import PHMMParams, backward_banded, forward_banded

PAR = HMMParam()
PARD = {k: getattr(PAR, k) for k in
        ("mat_mat", "mat_ins", "mat_del", "ins_mat", "ins_ins", "ins_del",
         "del_mat", "del_ins", "del_del")}
PARD["mat_emit"] = PAR.mat_emit
PARD["ins_emit"] = PAR.ins_emit


def _mutate(rng, seq, err):
    out = []
    for b in seq:
        r = rng.random()
        if r < err / 3:
            continue
        if r < 2 * err / 3:
            out.append(rng.integers(0, 4))
            continue
        if r < err:
            out.append(b)
            out.append(rng.integers(0, 4))
            continue
        out.append(b)
    return np.array(out, dtype=np.int8)


def _run_fwd(q, r, W=64):
    params = PHMMParams.from_hmmparam(PAR)
    off = linear_offsets(len(q), len(r), len(q), W)
    lk, tabs, fcum, _ = forward_banded(
        np.asarray(q, np.int8), np.asarray(r, np.int8), off,
        np.int32(len(q)), np.int32(len(r)), params, W)
    return float(lk), tabs, fcum, off


@pytest.mark.parametrize("err", [0.0, 0.05, 0.15])
def test_forward_matches_oracle(err):
    rng = np.random.default_rng(0)
    for _ in range(3):
        r = rng.integers(0, 4, size=60).astype(np.int8)
        q = _mutate(rng, r, err)
        lk, _, _, _ = _run_fwd(q, r, W=64)
        olk = oracle.phmm_forward(q, r, PARD)
        assert abs(lk - olk) < 1e-3 * max(1, abs(olk)), (err, lk, olk)


def test_forward_banded_wide_vs_narrow():
    # with low error, a narrow band must agree with the wide band
    rng = np.random.default_rng(1)
    r = rng.integers(0, 4, size=400).astype(np.int8)
    q = _mutate(rng, r, 0.05)
    lk_wide, _, _, _ = _run_fwd(q, r, W=256)
    lk_narrow, _, _, _ = _run_fwd(q, r, W=64)
    assert abs(lk_wide - lk_narrow) < 0.5


def test_forward_backward_column_identity():
    """For any template column j: sum_i fM*bM + fD*bD == total LK."""
    rng = np.random.default_rng(2)
    r = rng.integers(0, 4, size=80).astype(np.int8)
    q = _mutate(rng, r, 0.08)
    W = 96
    Q, T = len(q), len(r)
    params = PHMMParams.from_hmmparam(PAR)
    off = linear_offsets(Q, T, Q, W)
    lk, (Ms, Is, Ds), fcum, _ = forward_banded(
        q, r, off, np.int32(Q), np.int32(T), params, W)
    (bMs, bIs, bDs), bcum = backward_banded(
        q, r, off, np.int32(Q), np.int32(T), params, W)
    Ms, Ds, bMs, bDs = map(np.asarray, (Ms, Ds, bMs, bDs))
    fcum, bcum = np.asarray(fcum), np.asarray(bcum)
    off = np.asarray(off)
    lk = float(lk)
    for j in [1, 10, 40, T // 2, T]:
        total = 0.0
        for i in range(Q + 1):
            k = j - off[i]
            if 0 <= k < W:
                corr = np.exp(fcum[i] + bcum[i] - lk)
                total += (Ms[i, k] * bMs[i, k] + Ds[i, k] * bDs[i, k]) * corr
        assert abs(total - 1.0) < 1e-3, (j, total)


def test_likelihood_ranks_templates():
    """The true template should have higher LK than a mutated one."""
    rng = np.random.default_rng(3)
    t_true = rng.integers(0, 4, size=200).astype(np.int8)
    t_wrong = oracle.apply_edit(t_true, "S", 100, int((t_true[100] + 1) % 4))
    for _ in range(3):
        q = _mutate(rng, t_true, 0.05)
        lk_true, _, _, _ = _run_fwd(q, t_true, W=64)
        lk_wrong, _, _, _ = _run_fwd(q, t_wrong, W=64)
        assert lk_true > lk_wrong
