"""Polisher: recovers a template from noisy reads (kiley polish parity test)."""

import numpy as np

from jtk_tpu.datamodel import HMMParam
from jtk_tpu.ops.phmm import PHMMParams
from jtk_tpu.ops.polish import polish_until_converge


def _mutate(rng, seq, err):
    out = []
    for b in seq:
        x = rng.random()
        if x < err / 3:
            continue
        if x < 2 * err / 3:
            out.append((b + 1 + rng.integers(0, 3)) % 4)
            continue
        if x < err:
            out.append(b)
            out.append(rng.integers(0, 4))
            continue
        out.append(b)
    return np.array(out, dtype=np.int8)


def test_polish_recovers_template():
    rng = np.random.default_rng(0)
    true = rng.integers(0, 4, size=150).astype(np.int8)
    # draft = true + a few errors
    draft = _mutate(rng, true, 0.02)
    reads = [_mutate(rng, true, 0.05) for _ in range(12)]
    params = PHMMParams.from_hmmparam(HMMParam())
    polished, lks = polish_until_converge(draft, reads, params, W=64)
    # edit distance of polished vs true should be (near) zero
    from jtk_tpu.ops.banded_align import edit_align
    d, _, _, _ = edit_align(polished, true, W=64, mode="global")
    d0, _, _, _ = edit_align(draft, true, W=64, mode="global")
    assert d <= max(1, d0 // 8), (d0, d)
    assert len(lks) == 12


def test_polish_many_matches_single():
    from jtk_tpu.datamodel import HMMParam
    from jtk_tpu.io import sim
    from jtk_tpu.ops.phmm import PHMMParams
    from jtk_tpu.ops.polish import polish_many, polish_until_converge
    rng = np.random.default_rng(8)
    params = PHMMParams.from_hmmparam(HMMParam())
    tpls, pileups = [], []
    for _ in range(3):
        true = sim.random_genome(rng, 180)
        draft = sim.noisy_read(rng, true, 0.03)
        reads = [sim.noisy_read(rng, true, 0.06) for _ in range(12)]
        tpls.append(draft)
        pileups.append(reads)
    many, _ = polish_many(tpls, pileups, params, W=64, max_rounds=8)
    for t, p, m in zip(tpls, pileups, many):
        single, _ = polish_until_converge(t, p, params, W=64, max_rounds=8)
        assert np.array_equal(np.asarray(m), np.asarray(single)), \
            (len(m), len(single))


def test_band_buckets_merge_and_drop():
    """Per-pair band bucketing: one short pair must not inflate the batch
    band; tiny tail buckets merge upward into one dispatch; pathological
    deficits (beyond 8W) are dropped."""
    import numpy as np

    from jtk_tpu.ops.polish import band_buckets

    q = np.concatenate([np.full(606, 2000), np.full(4, 1900), [1700]])
    t = np.full(611, 2000)
    buckets, dropped = band_buckets(q, t, 128)
    assert [(w, len(i)) for w, i in buckets] == [(128, 606), (512, 5)]
    assert len(dropped) == 0
    # the main batch keeps its own band
    assert set(buckets[0][1]) == set(range(606))

    # all pairs needing a wider band get it
    buckets, _ = band_buckets(np.full(40, 1850), np.full(40, 2000), 128)
    assert buckets[0][0] == 256

    # deficit beyond 8W is dropped, the rest unaffected
    buckets, dropped = band_buckets(np.array([2000, 500]),
                                    np.array([2000, 2000]), 128)
    assert [(w, len(i)) for w, i in buckets] == [(128, 1)]
    assert list(dropped) == [1]
