"""Pallas fused pair-HMM forward vs the XLA-scan reference (interpret mode)."""

import numpy as np

from jtk_tpu.datamodel import HMMParam
from jtk_tpu.io import sim
from jtk_tpu.ops.banded_align import linear_offsets
from jtk_tpu.ops.pallas_phmm import pallas_likelihood_pileup
from jtk_tpu.ops.phmm import PHMMParams, likelihood_pileup
from jtk_tpu.ops.polish import effective_band


def test_pallas_forward_matches_scan():
    rng = np.random.default_rng(0)
    template = sim.random_genome(rng, 150)
    reads = [sim.noisy_read(rng, template, 0.08) for _ in range(10)]
    params = PHMMParams.from_hmmparam(HMMParam())
    got = pallas_likelihood_pileup(reads, template, params, W=64,
                                   interpret=True)
    # reference path
    q_lens = np.array([len(r) for r in reads], np.int32)
    W = effective_band(64, q_lens, len(template))
    Qpad = ((int(q_lens.max()) + 7) // 8) * 8
    qs = np.full((len(reads), Qpad), 4, np.int8)
    for i, r in enumerate(reads):
        qs[i, :len(r)] = r
    offs = np.stack([linear_offsets(int(l), len(template), Qpad, W)
                     for l in q_lens])
    want = np.asarray(likelihood_pileup(qs, template, offs, q_lens,
                                        np.int32(len(template)), params, W))
    assert np.allclose(got, want, rtol=1e-3, atol=0.5), \
        np.stack([got, want])


def _prep_batch(rng, n_reads=9, tlen=150, err=0.08, W=64):
    template = sim.random_genome(rng, tlen)
    reads = [sim.noisy_read(rng, template, err) for _ in range(n_reads)]
    q_lens = np.array([len(r) for r in reads], np.int32)
    W = effective_band(W, q_lens, tlen)
    Qpad = ((int(q_lens.max()) + 127) // 128) * 128
    qs = np.full((n_reads, Qpad), 4, np.int8)
    for i, r in enumerate(reads):
        qs[i, :len(r)] = r
    offs = np.stack([linear_offsets(int(l), tlen, Qpad, W) for l in q_lens])
    return template, qs, offs, q_lens, W


def test_pallas_tables_match_scan():
    from jtk_tpu.ops.pallas_phmm import pallas_tables_batch
    from jtk_tpu.ops.phmm import backward_banded, forward_banded
    rng = np.random.default_rng(3)
    params = PHMMParams.from_hmmparam(HMMParam())
    template, qs, offs, q_lens, W = _prep_batch(rng)
    tlen = len(template)
    (lk, (fM, fI, fD), fcum, rcs, (bM, bI, bD), bcum, B0, Qpad) = \
        pallas_tables_batch(qs, template, offs, q_lens, tlen, params, W,
                            interpret=True)
    for i in range(len(qs)):
        lk_w, (fMw, fIw, fDw), fcum_w, rcs_w = forward_banded(
            qs[i], np.asarray(template, np.int8), offs[i],
            np.int32(q_lens[i]), np.int32(tlen), params, W)
        (bMw, bIw, bDw), bcum_w = backward_banded(
            qs[i], np.asarray(template, np.int8), offs[i],
            np.int32(q_lens[i]), np.int32(tlen), params, W)
        assert abs(float(lk[i]) - float(lk_w)) < 2e-2, (i, lk[i], lk_w)
        np.testing.assert_allclose(np.asarray(fM)[i, :Qpad + 1],
                                   np.asarray(fMw), rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fD)[i, :Qpad + 1],
                                   np.asarray(fDw), rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fcum)[i, :Qpad + 1],
                                   np.asarray(fcum_w), rtol=1e-4, atol=2e-2)
        np.testing.assert_allclose(np.asarray(bM)[i, :Qpad + 1],
                                   np.asarray(bMw), rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bD)[i, :Qpad + 1],
                                   np.asarray(bDw), rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bcum)[i, :Qpad + 1],
                                   np.asarray(bcum_w), rtol=1e-4, atol=2e-2)
        np.testing.assert_array_equal(np.asarray(rcs)[i, :Qpad + 1],
                                      np.asarray(rcs_w))


def test_pallas_modtable_matches_scan():
    import os
    os.environ["JTK_TPU_PALLAS_INTERPRET"] = "1"
    from jtk_tpu.ops.modtable import (modification_table_pileup,
                                      modification_table_pileup_pallas)
    rng = np.random.default_rng(4)
    params = PHMMParams.from_hmmparam(HMMParam())
    template, qs, offs, q_lens, W = _prep_batch(rng, n_reads=6)
    tlen = len(template)
    Tpad = tlen
    tpl = np.asarray(template, np.int8)
    lk_p, tab_p = modification_table_pileup_pallas(
        qs, tpl, offs, q_lens, np.int32(tlen), params, W, Tpad,
        interpret=True)
    lk_s, tab_s = modification_table_pileup(
        qs, tpl, offs, q_lens, np.int32(tlen), params, W, Tpad)
    np.testing.assert_allclose(np.asarray(lk_p), np.asarray(lk_s),
                               rtol=1e-4, atol=2e-2)
    tp, ts = np.asarray(tab_p), np.asarray(tab_s)
    mask = ts > -1e29
    np.testing.assert_allclose(tp[mask], ts[mask], rtol=1e-4, atol=5e-2)


def test_pallas_modtable_strand_params():
    """Reverse-strand rows must be assembled with the reverse parameter set
    (regression: the fused path once used forward params for the whole
    batch)."""
    from jtk_tpu.ops.modtable import (modification_table_pileup,
                                      modification_table_pileup_pallas)
    rng = np.random.default_rng(7)
    params = PHMMParams.from_hmmparam(HMMParam())
    # a distinctly different reverse-strand parameter set
    t2 = np.asarray(params.trans).copy()
    t2[0] = [0.80, 0.15, 0.05]
    t2[1] = [0.55, 0.35, 0.10]
    me2 = np.asarray(params.mat_emit) * 0.7 + 0.3 * 0.25
    ie2 = np.asarray(params.ins_emit) * 0.5 + 0.5 * 0.25
    params_rev = PHMMParams(t2, me2.astype(np.float32),
                            ie2.astype(np.float32))
    template, qs, offs, q_lens, W = _prep_batch(rng, n_reads=6)
    tlen = len(template)
    tpl = np.asarray(template, np.int8)
    strands = np.array([True, False, True, False, False, True])
    lk_p, tab_p = modification_table_pileup_pallas(
        qs, tpl, offs, q_lens, np.int32(tlen), params, W, tlen,
        interpret=True, strands=strands, params_rev=params_rev)
    # scan reference: each strand group with its own params
    for par, rows in ((params, np.nonzero(strands)[0]),
                      (params_rev, np.nonzero(~strands)[0])):
        lk_s, tab_s = modification_table_pileup(
            qs[rows], tpl, offs[rows], q_lens[rows], np.int32(tlen),
            par, W, tlen)
        np.testing.assert_allclose(np.asarray(lk_p)[rows],
                                   np.asarray(lk_s), rtol=1e-4, atol=2e-2)
        tp, ts = np.asarray(tab_p)[rows], np.asarray(tab_s)
        mask = ts > -1e29
        np.testing.assert_allclose(tp[mask], ts[mask], rtol=1e-4, atol=5e-2)


def test_pallas_modtable_defer_matches_eager():
    """defer=True (async cross-bucket dispatch) must return byte-identical
    lks and device gain totals to the eager path — it only reorders the
    host-side fetches, never the device computation."""
    from jtk_tpu.ops.modtable import (finish_gains,
                                      modification_table_pileup_pallas)
    rng = np.random.default_rng(11)
    params = PHMMParams.from_hmmparam(HMMParam())
    template, qs, offs, q_lens, W = _prep_batch(rng, n_reads=6)
    tlen = len(template)
    tpl = np.asarray(template, np.int8)
    seg = np.array([0, 0, 1, 1, 1, 0], np.int32)
    lk_e, tot_e = modification_table_pileup_pallas(
        qs, tpl, offs, q_lens, np.int32(tlen), params, W, tlen,
        interpret=True, seg_ids=seg, n_seg=2, finish=False)
    lk_c, tot_d = modification_table_pileup_pallas(
        qs, tpl, offs, q_lens, np.int32(tlen), params, W, tlen,
        interpret=True, seg_ids=seg, n_seg=2, finish=False, defer=True)
    assert callable(lk_c)
    np.testing.assert_array_equal(np.asarray(lk_e), np.asarray(lk_c()))
    g_e = finish_gains(tot_e, 2, None, 0.0)
    g_d = finish_gains(tot_d, 2, None, 0.0)
    np.testing.assert_array_equal(np.asarray(g_e), np.asarray(g_d))


def test_pallas_modtable_reduced_totals_match_host():
    """seg_ids/n_seg: the on-device segment reduction must equal summing the
    per-pair gain tables on the host (polish_many's transfer saver)."""
    from jtk_tpu.ops.modtable import modification_table_pileup_pallas
    rng = np.random.default_rng(11)
    params = PHMMParams.from_hmmparam(HMMParam())
    template, qs, offs, q_lens, W = _prep_batch(rng, n_reads=9)
    tlen = len(template)
    tpl = np.asarray(template, np.int8)
    seg = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2], np.int32)
    lk0, tab0 = modification_table_pileup_pallas(
        qs, tpl, offs, q_lens, np.int32(tlen), params, W, tlen,
        interpret=True)
    lk1, tot1 = modification_table_pileup_pallas(
        qs, tpl, offs, q_lens, np.int32(tlen), params, W, tlen,
        interpret=True, seg_ids=seg, n_seg=3)
    np.testing.assert_allclose(lk1, lk0, rtol=1e-6)
    gain = np.where(tab0 < -1e29, np.float32(-1e30),
                    tab0 - lk0[:, None, None])
    want = np.stack([gain[seg == s].sum(0) for s in range(3)])
    np.testing.assert_allclose(np.asarray(tot1), want, rtol=2e-4, atol=0.5)


def test_pallas_modtable_sparse_gains_match_dense():
    """sparse_k top-k fetch: the (gain, pos, edit) triples and counts must
    agree with the dense totals (polish_many's 1 Mb-scale transfer saver)."""
    from jtk_tpu.ops.modtable import modification_table_pileup_pallas
    rng = np.random.default_rng(12)
    params = PHMMParams.from_hmmparam(HMMParam())
    template, qs, offs, q_lens, W = _prep_batch(rng, n_reads=9)
    tlen = len(template)
    tpl = np.asarray(template, np.int8)
    seg = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2], np.int32)
    _lk, tot = modification_table_pileup_pallas(
        qs, tpl, offs, q_lens, np.int32(tlen), params, W, tlen,
        interpret=True, seg_ids=seg, n_seg=3)
    min_gain = 0.1
    _lk2, sp = modification_table_pileup_pallas(
        qs, tpl, offs, q_lens, np.int32(tlen), params, W, tlen,
        interpret=True, seg_ids=seg, n_seg=3,
        sparse_k=16, min_gain=min_gain)
    assert sp.vals.shape == (3, 16)
    best_g = tot.max(-1)
    best_e = tot.argmax(-1)
    for s in range(3):
        np.testing.assert_array_equal(
            sp.counts[s], int((best_g[s] > min_gain).sum()))
        order = np.argsort(-best_g[s], kind="stable")[:16]
        np.testing.assert_allclose(sp.vals[s], best_g[s][order], rtol=1e-5)
        # positions agree wherever gains are not tied
        ties = np.isclose(best_g[s][order][:-1], best_g[s][order][1:])
        keep = ~np.concatenate([[False], ties]) & ~np.concatenate([ties,
                                                                   [False]])
        np.testing.assert_array_equal(sp.idx[s][keep], order[keep])
        np.testing.assert_array_equal(
            sp.ev[s][keep], best_e[s][order][keep])
        # dense fallback row matches the dense totals
        np.testing.assert_allclose(sp.dense_row(s), tot[s], rtol=1e-6)
