"""Device MCMC clustering on synthetic gain matrices (benchmark_clustering-style)."""

import numpy as np

from jtk_tpu.ops.cluster import (
    mcmc_cluster_batch, poisson_size_table, used_columns_and_gains,
)


def _ari(a, b):
    """Adjusted Rand index (misc.rs:5-46 counterpart)."""
    a, b = np.asarray(a), np.asarray(b)
    n = len(a)
    ka, kb = a.max() + 1, b.max() + 1
    m = np.zeros((ka, kb))
    for x, y in zip(a, b):
        m[x, y] += 1
    sa = m.sum(1)
    sb = m.sum(0)
    comb = lambda x: x * (x - 1) / 2
    idx = comb(m).sum()
    ea = comb(sa).sum()
    eb = comb(sb).sum()
    exp = ea * eb / comb(n)
    mx = (ea + eb) / 2
    return (idx - exp) / (mx - exp + 1e-12)


def _sim_gain_matrix(rng, R, V, k, gain=2.0, noise=0.6):
    """Reads from k haplotypes; each haplotype owns V//k variant columns where
    its reads have positive gains and others negative."""
    truth = rng.integers(0, k, R)
    X = rng.normal(0, noise, (R, V))
    for c in range(k):
        cols = np.arange(V)[np.arange(V) % k == c]
        X[np.ix_(truth == c, cols)] += gain
        X[np.ix_(truth != c, cols)] -= gain * 0.5
    return X.astype(np.float32), truth


def test_mcmc_recovers_two_clusters():
    import jax
    rng = np.random.default_rng(0)
    B, Rmax, V, K = 4, 40, 8, 2
    Xs, truths, Rs = [], [], []
    for b in range(B):
        X, truth = _sim_gain_matrix(rng, Rmax, V, K)
        Xs.append(X)
        truths.append(truth)
        Rs.append(Rmax)
    X = np.stack(Xs)
    size_lk = np.stack([poisson_size_table(Rmax, Rmax / K, K)] * B)
    assign, score = mcmc_cluster_batch(
        X, np.array(Rs, np.int32), size_lk, jax.random.PRNGKey(0), K, 2000, 8)
    assign = np.asarray(assign)
    for b in range(B):
        ari = _ari(truths[b], assign[b])
        assert ari > 0.8, (b, ari)
    assert np.asarray(score).min() > 0


def test_mcmc_four_clusters():
    import jax
    rng = np.random.default_rng(1)
    Rmax, V, K = 60, 12, 4
    X, truth = _sim_gain_matrix(rng, Rmax, V, K, gain=2.5)
    size_lk = poisson_size_table(Rmax, Rmax / K, K)
    assign, score = mcmc_cluster_batch(
        X[None], np.array([Rmax], np.int32), size_lk[None],
        jax.random.PRNGKey(1), K, 6000, 12)
    ari = _ari(truth, np.asarray(assign)[0])
    assert ari > 0.7, ari


def test_used_columns():
    rng = np.random.default_rng(2)
    X, truth = _sim_gain_matrix(rng, 30, 6, 2, gain=3.0, noise=0.3)
    used, lk_gain = used_columns_and_gains(X, truth, 2)
    assert used.any()
    assert lk_gain.shape == (30, 2)
    # reads should prefer their own cluster
    pref = lk_gain.argmax(1)
    agree = max((pref == truth).mean(), (pref == 1 - truth).mean())
    assert agree > 0.9
