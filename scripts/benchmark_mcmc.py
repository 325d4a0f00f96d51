"""MCMC clustering-step benchmark (reference parity harness).

Reference: ``sandbox/src/bin/benchmark_mcmc.rs`` + ``script/benchmark_mcmc.sh``
(SURVEY.md §2.6) — isolates the Metropolis clustering step from the HMM
profile machinery: simulates per-read variant-gain feature matrices for k=2
haplotypes with a given number of informative variant columns, runs
ops.cluster.mcmc_cluster_batch, and prints a TSV:
RESULT<TAB>seed<TAB>n_variants<TAB>time_ms<TAB>adjusted_rand_index

Sweep (reference defaults): cov 20, variants in {2,4,6,8}, k=2, many seeds.
Usage: python scripts/benchmark_mcmc.py [seeds] [cov] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jtk_tpu.ops.cluster import mcmc_cluster_batch, poisson_size_table
from jtk_tpu.stages.util import adjusted_rand_index


def run_one(seed, cov, n_var, k, gain=2.0, noise=0.6):
    rng = np.random.default_rng(seed)
    R = cov * k
    truth = np.arange(R) % k
    # carrying reads see +gain on their haplotype's columns, others ~0
    X = rng.normal(0.0, noise, (R, n_var * k)).astype(np.float32)
    for h in range(k):
        X[truth == h, h * n_var:(h + 1) * n_var] += gain
        X[truth != h, h * n_var:(h + 1) * n_var] -= 0.5 * gain
    import jax
    size_lk = poisson_size_table(R, cov, k)
    t0 = time.time()
    asn, score = mcmc_cluster_batch(
        X[None], np.array([R], np.int32), size_lk[None],
        jax.random.PRNGKey(seed), k, steps=2000 * R, restarts=12)
    dt = (time.time() - t0) * 1000
    ari = adjusted_rand_index(truth, np.asarray(asn)[0])
    print(f"RESULT\t{seed}\t{n_var}\t{dt:.0f}\t{ari:.4f}", flush=True)
    return ari


def main():
    seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cov = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    print("# RESULT\tseed\tn_variants\ttime_ms\tARI")
    for n_var in (2, 4, 6, 8):
        aris = [run_one(s, cov, n_var, k) for s in range(seeds)]
        print(f"# n_var={n_var}: mean ARI {np.mean(aris):.4f}", flush=True)


if __name__ == "__main__":
    main()
