"""Deletion fill: read-vs-read chunk-space alignment recovers runs of
co-missing chunks (deletion_fill.rs:611-982)."""

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import Chunk
from jtk_tpu.io import sim
from jtk_tpu.stages.deletion_fill import (_gotoh_batch, correct_deletion)
from jtk_tpu.stages.encode import encode


def test_gotoh_chunk_space():
    # read 0-1-2-3-4 vs query 0-1-4 (2,3 deleted in query)
    L = 8
    rc = np.full((1, L), -1, np.int64); rc[0, :5] = [0, 1, 2, 3, 4]
    rl = np.zeros((1, L), np.int64)
    rd = np.ones((1, L), bool)
    qc = np.full((1, L), -1, np.int64); qc[0, :3] = [0, 1, 4]
    ql = np.zeros((1, L), np.int64)
    qd = np.ones((1, L), bool)
    scores, ops = _gotoh_batch((rc, rl, rd), (qc, ql, qd),
                               np.array([5]), np.array([3]), L)
    # +1 +1 (matches) -1 (gap open, extension free) +1 = 2
    assert scores[0] == 2
    assert ops[0] == [("M", 2), ("D", 2), ("M", 1)]


def test_gotoh_cluster_mismatch_scores_minus_one():
    L = 4
    rc = np.full((1, L), -1, np.int64); rc[0, :2] = [0, 1]
    rl = np.zeros((1, L), np.int64); rl[0, 1] = 1   # cluster differs
    rd = np.ones((1, L), bool)
    qc = np.full((1, L), -1, np.int64); qc[0, :2] = [0, 1]
    ql = np.zeros((1, L), np.int64)
    qd = np.ones((1, L), bool)
    scores, ops = _gotoh_batch((rc, rl, rd), (qc, ql, qd),
                               np.array([2]), np.array([2]), L)
    # best co-optimal paths all score 0 (one +1 match eaten by the -1
    # mismatch or the gap open needed to reach a boundary endpoint)
    assert scores[0] == 0
    assert ops[0][0] in (("M", 1), ("M", 2))


def test_co_missing_adjacent_chunks_recovered():
    rng = np.random.default_rng(11)
    genome = sim.random_genome(rng, 14000)
    reads = sim.simulate_reads(rng, [genome], coverage=14, mean_len=12500,
                               error=0.02)
    ds = sim.reads_to_dataset(reads)
    ds.selected_chunks = [
        Chunk(i, seqmod.decode(genome[1000 + 2000 * i:3000 + 2000 * i])
              .decode())
        for i in range(6)
    ]
    encode(ds)
    # pick a read encoding chunks 0..4 at least; delete chunks 2 AND 3
    victim = None
    for er in ds.encoded_reads:
        chunks = [n.chunk for n in er.nodes]
        if all(c in chunks for c in (1, 2, 3, 4)):
            victim = er
            break
    assert victim is not None
    for c in (2, 3):
        i = next(i for i, n in enumerate(victim.nodes) if n.chunk == c)
        victim.remove(i)
    assert {n.chunk for n in victim.nodes}.isdisjoint({2, 3})
    correct_deletion(ds)
    got = {n.chunk for n in victim.nodes}
    assert 2 in got and 3 in got, got
    # read is still lossless
    assert victim.recover_raw_read() is not None
