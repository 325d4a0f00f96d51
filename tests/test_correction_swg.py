"""The row-streaming cummax SWG must match the dense O(A^2) DP exactly
(align_swg semantics, phmm_likelihood_correction.rs:481-533)."""

import numpy as np

from jtk_tpu.stages.correction import (GAP_EXTEND, GAP_OPEN, _adaptive_arm_cap,
                                       _swg_batch)


def _swg_dense(M, len1, len2):
    """The original full-3D implementation (kept as the test oracle)."""
    B, A, _ = M.shape
    LOW = -1e18
    mat = np.full((B, A + 1, A + 1), LOW)
    d2 = np.full((B, A + 1, A + 1), LOW)
    d1 = np.full((B, A + 1, A + 1), LOW)
    mat[:, 0, 0] = 0.0
    for i in range(1, A + 1):
        d1[:, i, 0] = GAP_OPEN + (i - 1) * GAP_EXTEND
        d2[:, 0, i] = GAP_OPEN + (i - 1) * GAP_EXTEND
    for i in range(1, A + 1):
        best_prev = np.maximum(
            np.maximum(mat[:, i - 1, :-1], d2[:, i - 1, :-1]),
            d1[:, i - 1, :-1])
        mat[:, i, 1:] = best_prev + M[:, i - 1, :]
        d1[:, i, 1:] = np.maximum(
            np.maximum(mat[:, i - 1, 1:] + GAP_OPEN,
                       d2[:, i - 1, 1:] + GAP_OPEN),
            d1[:, i - 1, 1:] + GAP_EXTEND)
        for j in range(1, A + 1):
            d2[:, i, j] = np.maximum(
                np.maximum(mat[:, i, j - 1] + GAP_OPEN,
                           d1[:, i, j - 1] + GAP_OPEN),
                d2[:, i, j - 1] + GAP_EXTEND)
    best = np.maximum(np.maximum(mat, d2), d1)
    bidx = np.arange(B)
    out = np.full(B, LOW)
    for j in range(A + 1):
        out = np.maximum(out, np.where(j <= len2, best[bidx, len1, j], LOW))
    for i in range(A + 1):
        out = np.maximum(out, np.where(i <= len1, best[bidx, i, len2], LOW))
    return out


def test_swg_batch_matches_dense_oracle():
    rng = np.random.default_rng(3)
    for A in (3, 8, 17):
        B = 40
        # mix of agreement-logit-scale scores and MISM penalties
        M = np.where(rng.random((B, A, A)) < 0.3,
                     rng.normal(2.0, 4.0, (B, A, A)), -100.0)
        len1 = rng.integers(0, A + 1, B)
        len2 = rng.integers(0, A + 1, B)
        got = _swg_batch(M, len1, len2)
        want = _swg_dense(M, len1, len2)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_swg_batch_empty_arms():
    M = np.full((2, 4, 4), -100.0)
    got = _swg_batch(M, np.array([0, 0]), np.array([0, 3]))
    # empty vs empty = 0; empty vs len-3 = best of gap or 0 at (0,0)
    assert got[0] == 0.0
    assert got[1] == 0.0  # free tail: (0,0) cell itself is on row len1=0


def test_adaptive_arm_cap_clamps():
    mk = lambda n: (None, list(range(n)), [])
    assert _adaptive_arm_cap([mk(2)] * 10) == 8      # floor
    assert _adaptive_arm_cap([mk(30)] * 10) == 30    # p95 passthrough
    assert _adaptive_arm_cap([mk(200)] * 10) == 64   # ceiling
    assert _adaptive_arm_cap([]) == 8
