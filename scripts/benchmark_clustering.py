"""Clustering accuracy/speed benchmark (reference parity harness).

Reference: ``sandbox/src/bin/benchmark_clustering.rs`` +
``script/benchmark_clustering.sh`` — simulates k haplotypes at given
coverage/length/error, runs the real per-chunk clustering, and prints a TSV:
RESULT<TAB>seed<TAB>template_len<TAB>time_ms<TAB>rand_index<TAB>adjusted_rand_index

Usage: python scripts/benchmark_clustering.py [seeds] [cov] [len] [err] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import Chunk, DataSet, EncodedRead, Node, RawRead, ReadType
from jtk_tpu.io import sim
from jtk_tpu.stages.local_clustering import local_clustering
from jtk_tpu.stages.util import adjusted_rand_index


def rand_index(a, b):
    a, b = np.asarray(a), np.asarray(b)
    n = len(a)
    same_a = a[:, None] == a[None, :]
    same_b = b[:, None] == b[None, :]
    agree = (same_a == same_b).sum() - n
    return agree / (n * (n - 1))


def run_one(seed, cov, tlen, err, k):
    rng = np.random.default_rng(seed)
    base = sim.random_genome(rng, tlen)
    haps = [base]
    n_var = max(tlen // 500, 2)
    for _ in range(k - 1):
        h = base.copy()
        pos = rng.choice(np.arange(20, tlen - 20), n_var, replace=False)
        for p in pos:
            h[p] = (h[p] + 1 + rng.integers(0, 3)) % 4
        haps.append(h)
    ds = DataSet.with_minimum_data("bench.fa", [], ReadType.ONT)
    ds.selected_chunks = [Chunk(0, seqmod.decode(base).decode(), 1, k)]
    truth = []
    for i in range(cov * k):
        h = i % k
        truth.append(h)
        codes = sim.noisy_read(rng, haps[h], err)
        seq = seqmod.decode(codes).decode()
        ds.raw_reads.append(RawRead(f"r{i}", "", i, seq))
        node = Node.new(0, bool(i % 4 < 2), seq, [("M", len(seq))], 0, 1)
        ds.encoded_reads.append(EncodedRead(i, len(seq), "", "", [], [node]))
    t0 = time.time()
    local_clustering(ds, seed=seed, flips_per_read=1000, restarts=12)
    dt = (time.time() - t0) * 1000
    asn = [er.nodes[0].cluster for er in ds.encoded_reads]
    ri = rand_index(truth, asn)
    ari = adjusted_rand_index(truth, asn)
    print(f"RESULT\t{seed}\t{tlen}\t{dt:.0f}\t{ri:.4f}\t{ari:.4f}",
          flush=True)
    return ari


def main():
    seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cov = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    tlen = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    err = float(sys.argv[4]) if len(sys.argv) > 4 else 0.10
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    print(f"# cov={cov} len={tlen} err={err} k={k}", flush=True)
    aris = [run_one(s, cov, tlen, err, k) for s in range(seeds)]
    print(f"# mean ARI {np.mean(aris):.4f}", flush=True)


if __name__ == "__main__":
    main()
