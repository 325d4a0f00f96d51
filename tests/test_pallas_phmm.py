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
