"""K2 modification table vs brute-force re-run of the forward oracle."""

import numpy as np
import pytest

from jtk_tpu.datamodel import HMMParam
from jtk_tpu.ops import oracle
from jtk_tpu.ops.banded_align import linear_offsets
from jtk_tpu.ops.modtable import modification_table
from jtk_tpu.ops.phmm import PHMMParams

PAR = HMMParam()
PARD = {k: getattr(PAR, k) for k in
        ("mat_mat", "mat_ins", "mat_del", "ins_mat", "ins_ins", "ins_del",
         "del_mat", "del_ins", "del_del")}
PARD["mat_emit"] = PAR.mat_emit
PARD["ins_emit"] = PAR.ins_emit


def _mutate(rng, seq, err):
    out = []
    for b in seq:
        x = rng.random()
        if x < err / 3:
            continue
        if x < 2 * err / 3:
            out.append(rng.integers(0, 4))
            continue
        if x < err:
            out.append(b)
            out.append(rng.integers(0, 4))
            continue
        out.append(b)
    return np.array(out, dtype=np.int8)


def _table(q, r, W=64, Tpad=None):
    Tpad = Tpad if Tpad is not None else len(r)
    params = PHMMParams.from_hmmparam(PAR)
    off = linear_offsets(len(q), len(r), len(q), W)
    lk, tab = modification_table(
        np.asarray(q, np.int8), np.asarray(r, np.int8), off,
        np.int32(len(q)), np.int32(len(r)), params, W, Tpad)
    return float(lk), np.asarray(tab)


def test_identity_sub_equals_baseline():
    rng = np.random.default_rng(0)
    r = rng.integers(0, 4, size=40).astype(np.int8)
    q = _mutate(rng, r, 0.05)
    lk, tab = _table(q, r)
    for j in range(len(r)):
        assert abs(tab[j, int(r[j])] - lk) < 2e-2, (j, tab[j, int(r[j])], lk)


DEL1 = 11  # del length-1 column (8 + COPY_SIZE)


def test_table_matches_bruteforce():
    rng = np.random.default_rng(1)
    r = rng.integers(0, 4, size=30).astype(np.int8)
    q = _mutate(rng, r, 0.10)
    lk, tab = _table(q, r)
    olk = oracle.phmm_forward(q, r, PARD)
    assert abs(lk - olk) < 2e-2
    # every sub / del / ins entry vs recomputing forward on the edited template
    for j in [0, 5, 14, 29]:
        for b in range(4):
            want = oracle.phmm_forward(q, oracle.apply_edit(r, "S", j, b), PARD)
            assert abs(tab[j, b] - want) < 3e-2, ("S", j, b, tab[j, b], want)
        want = oracle.phmm_forward(q, oracle.apply_edit(r, "D", j), PARD)
        assert abs(tab[j, DEL1] - want) < 3e-2, ("D", j, tab[j, DEL1], want)
    for j in [0, 7, 15, 30]:  # insert positions include T
        for b in range(4):
            want = oracle.phmm_forward(q, oracle.apply_edit(r, "I", j, b), PARD)
            assert abs(tab[j, 4 + b] - want) < 3e-2, ("I", j, b, tab[j, 4 + b], want)


def test_multi_del_matches_bruteforce():
    rng = np.random.default_rng(3)
    r = rng.integers(0, 4, size=30).astype(np.int8)
    q = _mutate(rng, r, 0.08)
    lk, tab = _table(q, r)
    for d in (2, 3):
        for j in [0, 4, 13, 30 - d]:
            want = oracle.phmm_forward(q, oracle.apply_edit(r, "D", j, d),
                                       PARD)
            got = tab[j, DEL1 + d - 1]
            assert abs(got - want) < 3e-2, ("D", d, j, got, want)


def test_copy_matches_bruteforce():
    rng = np.random.default_rng(4)
    r = rng.integers(0, 4, size=30).astype(np.int8)
    q = _mutate(rng, r, 0.08)
    lk, tab = _table(q, r)
    # c=1 is exact (equals inserting t[j]); c>=2 drops query-insertion
    # states between the copied columns, so it lower-bounds the true LK
    for c, tol in ((1, 3e-2), (2, 0.6), (3, 0.6)):
        for j in [0, 4, 13, 30 - c]:
            want = oracle.phmm_forward(q, oracle.apply_edit(r, "C", j, c),
                                       PARD)
            got = tab[j, 8 + c - 1]
            assert got <= want + 3e-2, ("C", c, j, got, want)
            assert abs(got - want) < tol, ("C", c, j, got, want)


def test_copy_detects_tandem_duplication():
    """A read carrying a 3bp tandem dup prefers the copy edit."""
    rng = np.random.default_rng(5)
    r = rng.integers(0, 4, size=40).astype(np.int8)
    jpos, c = 18, 3
    r_hap = oracle.apply_edit(r, "C", jpos, c)
    gains = []
    for _ in range(5):
        q = _mutate(rng, r_hap, 0.03)
        lk, tab = _table(q, r)
        gains.append(tab[jpos, 8 + c - 1] - lk)
    assert np.mean(gains) > 1.0, gains


def test_true_variant_has_positive_gain():
    """A read drawn from an edited template should prefer that edit."""
    rng = np.random.default_rng(2)
    r = rng.integers(0, 4, size=40).astype(np.int8)
    jpos = 20
    b_true = int((r[jpos] + 2) % 4)
    r_hap = oracle.apply_edit(r, "S", jpos, b_true)
    gains = []
    for _ in range(5):
        q = _mutate(rng, r_hap, 0.05)
        lk, tab = _table(q, r)
        gains.append(tab[jpos, b_true] - lk)
    assert np.mean(gains) > 1.0, gains


@pytest.mark.parametrize("c", [2, 3])
def test_copy_approximation_bounded_at_1kb(c):
    """VERDICT r2 #10: the c>=2 copy approximation (in-segment query-ins
    states dropped) must stay well under the gain-filter threshold
    (~0.5 x expected gain, i.e. O(1) nat) on production-scale templates,
    not just 30 bp toys.  Oracle: the banded scan forward of the EDITED
    template (exact for c=1; the same machinery the c>=2 rows approximate).
    """
    rng = np.random.default_rng(40 + c)
    r = rng.integers(0, 4, size=1000).astype(np.int8)
    q = _mutate(rng, r, 0.05)
    lk, tab = _table(q, r, W=128, Tpad=1024)
    errs = []
    for j in [20, 257, 503, 760, 1000 - c]:
        r_edit = oracle.apply_edit(r, "C", j, c)
        want, _ = _table(q, r_edit, W=128, Tpad=1024)
        got = float(tab[j, 8 + c - 1])
        # lower bound (states dropped), within tolerance of the exact LK
        assert got <= want + 5e-2, (c, j, got, want)
        errs.append(want - got)
    # recorded bound: worst-case approximation error on 1 kb, 5% error
    assert max(errs) < 1.0, (c, errs)
