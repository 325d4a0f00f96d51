"""Dense encoding: consensus chunks from read edge labels crossing a
collapsed multi-copy contig (dense_encoding.rs:334-546)."""

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import Chunk, DataSet, Edge, EncodedRead, Node, RawRead, ReadType
from jtk_tpu.io import sim
from jtk_tpu.stages.dense_encoding import dense_encoding


def test_dense_encoding_from_edge_labels():
    rng = np.random.default_rng(3)
    chunk_seqs = {i: seqmod.decode(sim.random_genome(rng, 300)).decode()
                  for i in range(6)}
    gap_a = seqmod.decode(sim.random_genome(rng, 600)).decode()
    gap_b_codes = seqmod.encode(gap_a)
    for p in rng.choice(np.arange(20, 580), 12, replace=False):
        gap_b_codes[p] = (gap_b_codes[p] + 1 + rng.integers(0, 3)) % 4
    gap_b = seqmod.decode(gap_b_codes).decode()

    ds = DataSet.with_minimum_data("x.fa", [], ReadType.ONT)
    ds.selected_chunks = [Chunk(i, chunk_seqs[i], 1, 1) for i in range(6)]
    # R1=2, R2=3 are the collapsed pair; flanks 0/1 enter, 4/5 exit
    rid = 0
    for hap, (flank, exit_, gap) in enumerate(((0, 4, gap_a),
                                               (1, 5, gap_b))):
        for _ in range(10):
            walk = [flank, 2, 3, exit_]
            gaps = {1: gap}  # gap between walk[1] (R1) and walk[2] (R2)
            nodes, parts, pos = [], [], 0
            for wi, ch in enumerate(walk):
                s = chunk_seqs[ch]
                n = Node.new(ch, True, s, [("M", len(s))], pos, 1)
                nodes.append(n)
                parts.append(s)
                pos += len(s)
                gapseq = gaps.get(wi, "")
                if gapseq and wi < len(walk) - 1:
                    parts.append(gapseq)
                    pos += len(gapseq)
            read_seq = "".join(parts)
            edges = [Edge.from_nodes(a, b, read_seq)
                     for a, b in zip(nodes, nodes[1:])]
            ds.raw_reads.append(RawRead(f"r{rid}", "", rid, read_seq))
            ds.encoded_reads.append(
                EncodedRead(rid, len(read_seq), "", "", edges, nodes))
            rid += 1
    ds.coverage.value = 10.0
    ds.coverage.protected = True
    n_before = len(ds.selected_chunks)
    dense_encoding(ds, min_span_reads=3)
    assert len(ds.selected_chunks) > n_before
    new_ids = {c.id for c in ds.selected_chunks[n_before:]}
    # the new chunk(s) cover the gap sequence
    new_chunk = ds.selected_chunks[n_before]
    from jtk_tpu.ops.banded_align import edit_align
    q = new_chunk.codes()
    score, _c, _s, _e = edit_align(q, seqmod.encode(gap_a), W=256,
                                   mode="infix")
    assert score < 0.1 * len(q), score
    # and reads got re-encoded through them
    hit = sum(1 for er in ds.encoded_reads
              if any(n.chunk in new_ids for n in er.nodes))
    assert hit >= 5, hit
