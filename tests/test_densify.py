"""Chunk-set densification: fill_sparse_region / fill_tips place consensus
chunks into engineered coverage gaps (determine_chunks.rs:388-714)."""

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import Chunk
from jtk_tpu.io import sim
from jtk_tpu.stages.determine_chunks import (fill_sparse_region, fill_tips,
                                             filter_chunk_by_ovlp)
from jtk_tpu.stages.encode import encode


def _gapped_dataset(rng, genome_len=12000, cov=16):
    genome = sim.random_genome(rng, genome_len)
    reads = sim.simulate_reads(rng, [genome], coverage=cov, mean_len=9000,
                               error=0.03)
    ds = sim.reads_to_dataset(reads)
    return ds, genome


def test_fill_sparse_region_places_chunk_in_gap():
    rng = np.random.default_rng(5)
    ds, genome = _gapped_dataset(rng)
    # chunks cover [500:2500] and [6000:8000]: a 3.5 kbp gap between them
    ds.selected_chunks = [
        Chunk(0, seqmod.decode(genome[500:2500]).decode()),
        Chunk(1, seqmod.decode(genome[6000:8000]).decode()),
    ]
    encode(ds)
    assert any(len(er.nodes) >= 2 for er in ds.encoded_reads)
    new = fill_sparse_region(ds, None, chunk_len=2000)
    assert new >= 1
    # the new chunk is encoded between chunk 0 and 1 on spanning reads
    hit = 0
    for er in ds.encoded_reads:
        chunks = [n.chunk for n in er.nodes]
        if any(c >= 2 for c in chunks):
            hit += 1
            # sanity: still lossless
            assert er.recover_raw_read() is not None
    assert hit >= 3
    # and the consensus matches the gap region well
    new_chunk = [c for c in ds.selected_chunks if c.id >= 2][0]
    gap = genome[2500:6000]
    from jtk_tpu.ops.banded_align import edit_align
    q = new_chunk.codes()
    score, _cig, _rs, _re = edit_align(q, gap, W=512, mode="infix")
    assert score < 0.05 * len(q), score


def test_fill_tips_extends_boundary():
    rng = np.random.default_rng(6)
    ds, genome = _gapped_dataset(rng)
    # single chunk at the left; long trailing gaps to the right
    ds.selected_chunks = [
        Chunk(0, seqmod.decode(genome[500:2500]).decode()),
    ]
    encode(ds)
    new = fill_tips(ds, None, chunk_len=2000)
    assert new >= 1
    hit = sum(1 for er in ds.encoded_reads
              if any(n.chunk >= 1 for n in er.nodes))
    assert hit >= 3


def test_filter_chunk_by_ovlp_drops_duplicate():
    rng = np.random.default_rng(7)
    ds, genome = _gapped_dataset(rng)
    # two nearly-identical chunks (shifted by 200 bp): they overlap on reads
    ds.selected_chunks = [
        Chunk(0, seqmod.decode(genome[500:2500]).decode()),
        Chunk(1, seqmod.decode(genome[700:2700]).decode()),
        Chunk(2, seqmod.decode(genome[6000:8000]).decode()),
    ]
    encode(ds)
    removed = filter_chunk_by_ovlp(ds, chunk_len=2000)
    assert removed == 1
    ids = {c.id for c in ds.selected_chunks}
    assert 2 in ids and len(ids) == 2
