"""Consensus polishing fidelity: tile re-anchoring + terminal-window shrink.

Reference behaviors covered: fix_alignment window-boundary re-alignment
(haplotyper/src/assemble/consensus/mod.rs:498-561) and partial-window
tolerance at contig ends (consensus/mod.rs:445-496).
"""

import numpy as np

from jtk_tpu.stages.consensus import (_reanchor_tiles, _remap_tiles,
                                      _terminal_shrink)


def _true_map(p, ins_at, ins_len, del_at, del_len):
    """Old coordinate -> new coordinate under one insertion + one deletion
    (no test point falls inside the deleted interval)."""
    q = p
    if p >= ins_at:
        q += ins_len
    if p >= del_at + del_len:
        q -= del_len
    return q


def test_reanchor_tiles_fixes_interpolation_drift():
    rng = np.random.default_rng(7)
    old = rng.integers(0, 4, 6000).astype(np.int8)
    ins_at, ins_len = 1000, 120
    del_at, del_len = 4500, 80
    ins = rng.integers(0, 4, ins_len).astype(np.int8)
    new = np.concatenate([old[:ins_at], ins, old[ins_at:del_at],
                          old[del_at + del_len:]])
    tiles = [{"node": (i, 0), "fwd": True, "start": s, "end": s + 2000,
              "_old_start": s, "_old_end": s + 2000}
             for i, s in enumerate((0, 2000, 4000))]
    contig = {"seq": "", "tiles": tiles}
    # coarse interpolation (one global anchor pair -> uniform stretch)
    _remap_tiles(contig, [0], [0], len(old), len(new))
    # interpolation alone is wrong in the indel-dense region
    # (tile 1 true start is 2120, interp gives ~2013)
    _reanchor_tiles(contig, old, new)
    want = [(0, _true_map(2000, ins_at, ins_len, del_at, del_len)),
            (_true_map(2000, ins_at, ins_len, del_at, del_len),
             _true_map(4000, ins_at, ins_len, del_at, del_len)),
            (_true_map(4000, ins_at, ins_len, del_at, del_len),
             _true_map(6000, ins_at, ins_len, del_at, del_len))]
    for t, (ws, we) in zip(tiles, want):
        assert abs(t["start"] - ws) <= 8, (t, ws, we)
        assert abs(t["end"] - we) <= 8, (t, ws, we)
        assert "_old_start" not in t


def test_reanchor_tiles_keeps_interp_on_garbage():
    rng = np.random.default_rng(8)
    old = rng.integers(0, 4, 3000).astype(np.int8)
    new = rng.integers(0, 4, 3000).astype(np.int8)  # unrelated sequence
    tiles = [{"node": (0, 0), "fwd": True, "start": 500, "end": 2500,
              "_old_start": 500, "_old_end": 2500}]
    contig = {"seq": "", "tiles": tiles}
    _reanchor_tiles(contig, old, new)
    assert tiles[0]["start"] == 500 and tiles[0]["end"] == 2500


def test_terminal_shrink_first_and_last_window():
    # reads taper: only 2 of 6 cover the very start; min_cov=4 coverage
    # starts at 300
    spans = [(0, 2100), (50, 2100), (300, 2150), (310, 2200),
             (320, 2080), (400, 2060)]
    s0, s1 = _terminal_shrink(spans, 0, 2100, 0, 2000, n_win=3, wi=0,
                              min_cov=4)
    assert 300 <= s0 <= 400
    assert s1 == 2100
    # last window: min_cov-th largest end among window-start-covering reads
    spans = [(3900, 6000), (3900, 5800), (3910, 5700), (3950, 5600),
             (3960, 5400)]
    s0, s1 = _terminal_shrink(spans, 3900, 6100, 4000, 6100, n_win=3, wi=2,
                              min_cov=4)
    assert s0 == 3900
    assert 5500 <= s1 <= 5700


def test_terminal_shrink_noop_mid_window():
    spans = [(0, 9000)] * 6
    s0, s1 = _terminal_shrink(spans, 1900, 4100, 2000, 4000, n_win=5, wi=1,
                              min_cov=4)
    assert (s0, s1) == (1900, 4100)


def test_trim_segments_multi_matches_single():
    from jtk_tpu.stages.consensus import trim_segments, trim_segments_multi
    rng = np.random.default_rng(5)
    jobs = []
    for _ in range(3):
        tpl = rng.integers(0, 4, 500).astype(np.int8)
        segs = []
        for _ in range(4):
            lo = rng.integers(0, 40)
            seg = np.concatenate([rng.integers(0, 4, lo),
                                  tpl.copy(),
                                  rng.integers(0, 4, rng.integers(0, 40))])
            m = rng.random(len(seg)) < 0.05
            seg[m] = (seg[m] + 1) % 4
            segs.append(seg.astype(np.int8))
        jobs.append((tpl, segs))
    multi = trim_segments_multi(jobs, margin=150)
    for (tpl, segs), got in zip(jobs, multi):
        want = trim_segments(tpl, segs, 150, return_index=True)
        assert len(got) == len(want)
        for (gs, gi), (ws, wi) in zip(got, want):
            assert gi == wi
            # same span within a couple bp (different pad buckets can move
            # the band edge)
            assert abs(len(gs) - len(ws)) <= 2


def test_stitch_cuts_batch_matches_sequential():
    from jtk_tpu.stages.consensus import _stitch, _stitch_cuts_batch
    rng = np.random.default_rng(6)
    base = rng.integers(0, 4, 3000).astype(np.int8)
    ov = 100
    # three overlapping windows of one underlying sequence
    parts = [base[0:1200].copy(), base[1000:2200].copy(),
             base[2000:3000].copy()]
    tail_cut, head_chop = _stitch_cuts_batch(parts, ov)
    pieces = [p[hc:tc] for p, tc, hc in zip(parts, tail_cut, head_chop)]
    got = np.concatenate(pieces)
    out = parts[0]
    for p in parts[1:]:
        out, _ = _stitch(out, p, 2 * ov)
    np.testing.assert_array_equal(got, out)
