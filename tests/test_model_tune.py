"""Gradient-EM HMM fitting: improves likelihood on simulated data, stays finite."""

import numpy as np

from jtk_tpu.datamodel import HMMParam
from jtk_tpu.io import sim
from jtk_tpu.ops.banded_align import linear_offsets
from jtk_tpu.ops.phmm import PHMMParams, likelihood_pileup
from jtk_tpu.stages.model_tune import _fit_strand, _params_to_hmmparam


def _lk_sum(reads, template, params, W=64):
    Qpad = ((max(len(r) for r in reads) + 63) // 64) * 64
    qs = np.full((len(reads), Qpad), 4, np.int8)
    for i, r in enumerate(reads):
        qs[i, :len(r)] = r
    qlens = np.array([len(r) for r in reads], np.int32)
    from jtk_tpu.ops.polish import effective_band
    W = effective_band(W, qlens, len(template))
    offs = np.stack([linear_offsets(int(l), len(template), Qpad, W)
                     for l in qlens])
    lks = likelihood_pileup(qs, template, offs, qlens,
                            np.int32(len(template)), params, W)
    return float(np.sum(np.asarray(lks)))


def test_fit_improves_likelihood_and_stays_finite():
    rng = np.random.default_rng(0)
    template = sim.random_genome(rng, 200)
    reads = [sim.noisy_read(rng, template, 0.08) for _ in range(16)]
    init = PHMMParams.from_hmmparam(HMMParam())
    lk0 = _lk_sum(reads, template, init)
    fitted = _fit_strand(reads, template, init, W=64, steps=40)
    for x in fitted:
        assert np.all(np.isfinite(np.asarray(x))), "non-finite params"
    lk1 = _lk_sum(reads, template, fitted)
    assert lk1 > lk0, (lk0, lk1)
    hp = _params_to_hmmparam(fitted)
    # rows remain stochastic
    assert abs(hp.mat_mat + hp.mat_ins + hp.mat_del - 1) < 1e-3
    assert abs(sum(hp.mat_emit[:4]) - 1) < 1e-3
