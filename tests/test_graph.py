"""DitchGraph + copy-number tests on fabricated encoded reads
(reference pattern: ditch_graph/mod.rs:1852-2042 gen_read tests)."""

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import Edge, EncodedRead, Node
from jtk_tpu.graph.copy_number import assign_copy_numbers
from jtk_tpu.graph.ditch_graph import HEAD, TAIL, DitchGraph
from jtk_tpu.io.gfa import contigs_to_gfa, parse_gfa


def _mk_read(rid, walk, chunk_seqs, forward=True):
    """walk: list of (chunk, cluster).  Builds a perfect encoded read."""
    if not forward:
        walk = walk[::-1]
    nodes, edges = [], []
    pos = 0
    seq_parts = []
    for i, (ch, cl) in enumerate(walk):
        s = chunk_seqs[ch]
        node_seq = s if forward else seqmod.revcomp_ascii(s.encode()).decode()
        n = Node.new(ch, forward, node_seq, [("M", len(s))], pos, 2)
        n.cluster = cl
        nodes.append(n)
        seq_parts.append(node_seq if forward else node_seq)
        pos += len(s)
    read_seq = "".join(
        chunk_seqs[ch] if forward else
        seqmod.revcomp_ascii(chunk_seqs[ch].encode()).decode()
        for ch, _ in walk)
    for a, b in zip(nodes, nodes[1:]):
        edges.append(Edge.from_nodes(a, b, read_seq))
    return EncodedRead(rid, len(read_seq), "", "", edges, nodes)


def _diploid_reads(rng, chunk_seqs, n_per_hap=12):
    hapA = [(0, 0), (1, 0), (2, 0), (3, 0)]
    hapB = [(0, 0), (1, 1), (2, 1), (3, 0)]
    reads = []
    rid = 0
    for hap in (hapA, hapB):
        for i in range(n_per_hap):
            if i % 3 == 0:  # partial window
                s = int(rng.integers(0, 2))
                e = int(rng.integers(s + 2, len(hap) + 1))
            else:  # full span
                s, e = 0, len(hap)
            fwd = bool(rng.random() < 0.7)
            reads.append(_mk_read(rid, hap[s:e], chunk_seqs, fwd))
            rid += 1
    return reads


def test_graph_build_and_copy_numbers():
    rng = np.random.default_rng(0)
    chunk_seqs = {i: seqmod.decode(rng.integers(0, 4, 100).astype(np.int8)).decode()
                  for i in range(4)}
    reads = _diploid_reads(rng, chunk_seqs)
    g = DitchGraph.from_encoded_reads(reads, chunk_seqs)
    g.sanity_check()
    assert (0, 0) in g.nodes and (1, 1) in g.nodes
    # haploid coverage ~ per-hap spanning reads
    occ_shared = g.nodes[(1, 0)].occ + g.nodes[(1, 1)].occ
    hap_cov = occ_shared / 2
    assign_copy_numbers(g, hap_cov)
    assert g.nodes[(0, 0)].copy_num == 2, g.nodes[(0, 0)]
    assert g.nodes[(1, 0)].copy_num == 1
    assert g.nodes[(1, 1)].copy_num == 1
    assert g.nodes[(3, 0)].copy_num == 2


def test_spell_separates_haplotypes():
    rng = np.random.default_rng(1)
    chunk_seqs = {i: seqmod.decode(rng.integers(0, 4, 100).astype(np.int8)).decode()
                  for i in range(4)}
    reads = _diploid_reads(rng, chunk_seqs)
    g = DitchGraph.from_encoded_reads(reads, chunk_seqs)
    assign_copy_numbers(g, 12)
    contigs = g.spell()
    # branch at (0,0)/(3,0): expect 4 contigs
    summaries = sorted(tuple((s[0], s[1]) for s in c["summary"]) for c in contigs)
    flat = set()
    for s in summaries:
        flat.update(s)
    assert flat == {(0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (3, 0)}
    assert len(contigs) == 4, summaries
    # the het contigs walk (1,x)-(2,x) together
    het = [s for s in summaries if len(s) == 2]
    assert (((1, 0), (2, 0)) in het or ((2, 0), (1, 0)) in het)
    # contig sequences are correct concatenations (up to revcomp)
    for c in contigs:
        want = "".join(chunk_seqs[ch] for ch, _ in
                       [(s[0], s[1]) for s in c["summary"]])
        got = c["seq"]
        rc = seqmod.revcomp_ascii(want.encode()).decode()
        assert got in (want, rc), (len(got), len(want))


def test_gfa_roundtrip():
    contigs = [{"seq": "ACGT", "summary": [(0, 0, True, 10, 2)]},
               {"seq": "GGCC", "summary": [(1, 0, True, 5, 1)]}]
    gfa = contigs_to_gfa(contigs, [(0, "+", 1, "+", 4)])
    segs, links = parse_gfa(gfa)
    assert segs["tig_0000"]["seq"] == "ACGT"
    assert segs["tig_0000"]["tags"]["cp"] == "2"
    assert links == [("tig_0000", "+", "tig_0001", "+")]


def test_lightweight_edge_removal():
    rng = np.random.default_rng(2)
    chunk_seqs = {i: "A" * 50 for i in range(3)}
    reads = [_mk_read(i, [(0, 0), (1, 0)], chunk_seqs) for i in range(10)]
    # one spurious read connecting 0 -> 2
    reads.append(_mk_read(99, [(0, 0), (2, 0)], chunk_seqs))
    g = DitchGraph.from_encoded_reads(reads, chunk_seqs)
    assert len(g.edges) == 2
    # retain mode keeps the spur (it is (2,0)'s only edge) ...
    g.remove_lightweight_edges(1, True)
    assert len(g.edges) == 2
    # ... the non-retain pass removes it
    g.remove_lightweight_edges(1, False)
    assert len(g.edges) == 1
