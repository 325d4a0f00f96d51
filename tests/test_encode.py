"""K4 mapper + encode stage on simulated reads: placement accuracy and the
lossless-recovery invariant (sanity_check)."""

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import Chunk
from jtk_tpu.io import sim
from jtk_tpu.mapper import ChunkIndex, pack_kmers
from jtk_tpu.stages.encode import encode


def test_pack_kmers():
    codes = seqmod.encode(b"ACGTACGTNN")
    vals, ok = pack_kmers(codes, 4)
    assert len(vals) == 7
    # ACGT = 0b00011011 = 27
    assert vals[0] == 27
    assert ok[:5].all() and not ok[5:].any()


def test_index_finds_planted_chunk():
    rng = np.random.default_rng(0)
    genome = sim.random_genome(rng, 5000)
    chunk = genome[1000:1500]
    idx = ChunkIndex({7: chunk}, k=15)
    read = sim.noisy_read(rng, genome[500:3000], 0.08)
    cands = idx.candidates(read, 0, min_hits=3, margin=100)
    assert any(c.chunk_id == 7 and c.is_forward for c in cands)
    # reverse strand read
    read_rc = seqmod.revcomp(read)
    cands_rc = idx.candidates(read_rc, 0, min_hits=3, margin=100)
    assert any(c.chunk_id == 7 and not c.is_forward for c in cands_rc)


def test_encode_end_to_end_sim():
    rng = np.random.default_rng(1)
    genome = sim.random_genome(rng, 6000)
    clen = 500
    chunk_starts = list(range(250, 5500, clen + 250))
    reads = sim.simulate_reads(rng, [genome], coverage=8, mean_len=2500,
                               error=0.08)
    ds = sim.reads_to_dataset(reads)
    ds.selected_chunks = [
        Chunk(i, seqmod.decode(genome[s:s + clen]).decode())
        for i, s in enumerate(chunk_starts)
    ]
    encode(ds, margin=100, W=256)
    ds.sanity_check()  # lossless recovery of every encoded read
    # most reads should be encoded, with plausible node counts
    assert len(ds.encoded_reads) >= len(reads) * 0.6
    n_nodes = sum(len(r.nodes) for r in ds.encoded_reads)
    assert n_nodes > 0
    # check placements against truth
    placed, correct = 0, 0
    for er in ds.encoded_reads:
        rmeta = reads[er.id]
        for node in er.nodes:
            truth_start = chunk_starts[node.chunk]
            if rmeta["is_forward"]:
                est = rmeta["start"] + node.position_from_start
            else:
                est = rmeta["end"] - node.position_from_start - node.query_length()
            placed += 1
            if abs(est - truth_start) < 100:
                correct += 1
    assert placed > 10
    assert correct / placed > 0.9, (correct, placed)
    # error rates of alignments should be near the simulated error
    errs = []
    for er in ds.encoded_reads:
        for node in er.nodes:
            chunk = ds.selected_chunks[node.chunk]
            mat, mism, ins, dele = node.aln_stats(chunk.seq)
            errs.append((mism + ins + dele) / (mat + mism + ins + dele))
    assert 0.02 < np.mean(errs) < 0.15, np.mean(errs)


def test_native_candidate_parity():
    """native/kmer_vote.cc must match the numpy voting path candidate-for-
    candidate (same order, same windows, same hit counts), incl. reads
    containing N."""
    import jtk_tpu.native_ext as ne
    from jtk_tpu import seq as seqmod
    from jtk_tpu.io import sim
    from jtk_tpu.mapper import ChunkIndex
    rng = np.random.default_rng(11)
    genome = sim.random_genome(rng, 30_000)
    chunk_seqs = {i: genome[s:s + 2000]
                  for i, s in enumerate(range(0, 28_000, 2500))}
    reads = [sim.noisy_read(rng, genome[s:s + 8000], 0.08)
             for s in rng.integers(0, 22_000, size=12)]
    # sprinkle Ns into a couple of reads
    for r in reads[:3]:
        r[rng.integers(0, len(r), size=5)] = 4
    reads += [rng.integers(0, 4, size=40).astype(np.int8)]  # too short-ish
    idx = ChunkIndex(chunk_seqs, k=15)
    got = idx.candidates_batch(reads)
    if ne.load("kmer_vote") is None:
        return  # no toolchain: numpy path is the only path
    saved = ne._cache.get("kmer_vote")
    try:
        ne._cache["kmer_vote"] = None
        want = idx.candidates_batch(reads)
    finally:
        ne._cache["kmer_vote"] = saved
    assert len(got) == len(want) > 0
    for a, b in zip(got, want):
        assert (a.read_idx, a.chunk_id, a.is_forward, a.window_start,
                a.window_len, a.n_hits) == \
               (b.read_idx, b.chunk_id, b.is_forward, b.window_start,
                b.window_len, b.n_hits)
