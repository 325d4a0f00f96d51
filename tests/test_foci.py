"""Focus-based repeat resolution on mock graphs (repeat_resolve_by_focus.rs
mechanisms: per-distance count tables, LK test, duplicate_along, bypass)."""

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import Edge, EncodedRead, Node
from jtk_tpu.graph.ditch_graph import HEAD, TAIL, DitchGraph
from jtk_tpu.graph.foci import bypass_repeats, resolve_repeats


def _mk_read(rid, walk, chunk_seqs, forward=True):
    if not forward:
        walk = walk[::-1]
    nodes = []
    pos = 0
    for ch, cl in walk:
        s = chunk_seqs[ch]
        node_seq = s if forward else seqmod.revcomp_ascii(s.encode()).decode()
        n = Node.new(ch, forward, node_seq, [("M", len(s))], pos, 2)
        n.cluster = cl
        nodes.append(n)
        pos += len(s)
    read_seq = "".join(
        chunk_seqs[ch] if forward else
        seqmod.revcomp_ascii(chunk_seqs[ch].encode()).decode()
        for ch, _ in walk)
    edges = [Edge.from_nodes(a, b, read_seq)
             for a, b in zip(nodes, nodes[1:])]
    return EncodedRead(rid, len(read_seq), "", "", edges, nodes)


def _repeat_dataset(rng, spans, counts, n_chunks):
    chunk_seqs = {i: "ACGT" * 25 for i in range(n_chunks)}
    reads = []
    rid = 0
    for walk, cnt in zip(spans, counts):
        for _ in range(cnt):
            reads.append(_mk_read(rid, walk, chunk_seqs))
            rid += 1
    g = DitchGraph.from_encoded_reads(reads, chunk_seqs)
    return g, reads


def test_resolve_repeats_duplicates_shared_node():
    rng = np.random.default_rng(0)
    # hapA: 0 - R(4) - 2 ; hapB: 1 - R(4) - 3 ; R shared copy-2 repeat
    g, reads = _repeat_dataset(
        rng,
        [[(0, 0), (4, 0), (2, 0)], [(1, 0), (4, 0), (3, 0)]],
        [10, 10], 5)
    for key, dn in g.nodes.items():
        dn.copy_num = 2 if key == (4, 0) else 1
    for e in g.edges.values():
        e.copy_num = 1
    # one focus resolves a haplotype through R; the remainder becomes a
    # simple path, so a single application can fully resolve the region
    n = resolve_repeats(g, reads, min_span=2, llr_thr=1.0)
    assert n >= 1, n
    # R resolved into per-haplotype copies; contigs separate the haplotypes
    contigs = g.spell()
    walks = [frozenset((s[0], s[1]) for s in c["summary"]) for c in contigs]
    assert frozenset({(0, 0), (4, 0), (2, 0)}) in walks, walks
    assert frozenset({(1, 0), (4, 0), (3, 0)}) in walks, walks


def test_resolve_repeats_respects_min_span():
    rng = np.random.default_rng(1)
    g, reads = _repeat_dataset(
        rng,
        [[(0, 0), (4, 0), (2, 0)], [(1, 0), (4, 0), (3, 0)]],
        [1, 1], 5)   # only one spanning read each: below min_span
    for key, dn in g.nodes.items():
        dn.copy_num = 2 if key == (4, 0) else 1
    for e in g.edges.values():
        e.copy_num = 1
    n = resolve_repeats(g, reads, min_span=3, llr_thr=1.0)
    assert n == 0


def test_bypass_repeats_pairs_entries_and_exits():
    rng = np.random.default_rng(2)
    # 2-in/2-out copy-2 path: entries 0,1 -> R(4) -> exits 2,3
    # reads pair 0<->2 and 1<->3
    g, reads = _repeat_dataset(
        rng,
        [[(0, 0), (4, 0), (2, 0)], [(1, 0), (4, 0), (3, 0)]],
        [8, 8], 5)
    for key, dn in g.nodes.items():
        dn.copy_num = 2 if key == (4, 0) else 1
    for e in g.edges.values():
        e.copy_num = 1
    n = bypass_repeats(g, reads, llr_thr=1.0, min_span=2)
    assert n >= 1, n
    contigs = g.spell()
    walks = [frozenset((s[0], s[1]) for s in c["summary"]) for c in contigs]
    joined = [w for w in walks if len(w) >= 3]
    assert any({(0, 0), (2, 0)} <= w for w in joined) or \
        any({(1, 0), (3, 0)} <= w for w in joined), walks
