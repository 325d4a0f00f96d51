"""Graph-cleanup zoo tests on fabricated encoded reads (reference pattern:
ditch_graph/mod.rs:1852-2042): each mechanism gets a mock graph exercising
exactly its trigger shape."""

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import Edge, EncodedRead, Node
from jtk_tpu.graph.ditch_graph import HEAD, TAIL, DitchGraph


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


def _graph(walks, n_chunks, counts=None):
    chunk_seqs = {i: "ACGT" * 25 for i in range(n_chunks)}
    reads = []
    rid = 0
    for wi, walk in enumerate(walks):
        for _ in range(counts[wi] if counts else 1):
            reads.append(_mk_read(rid, walk, chunk_seqs))
            rid += 1
    return DitchGraph.from_encoded_reads(reads, chunk_seqs)


def _set_copies(g, mapping, default=1):
    for n, dn in g.nodes.items():
        dn.copy_num = mapping.get(n, default)
    for e in g.edges.values():
        e.copy_num = 1


def test_zip_up_overclustering_removes_reconverging_fork():
    # (0,0) forks into (1,0)/(1,1) which reconverge at (2,0): overclustering
    g = _graph([[(0, 0), (1, 0), (2, 0)], [(0, 0), (1, 1), (2, 0)]], 3,
               counts=[6, 5])
    _set_copies(g, {(0, 0): 1, (1, 0): 1, (1, 1): 1, (2, 0): 1})
    removed = g.zip_up_overclustering(2)
    assert removed == 1
    assert ((1, 0) in g.nodes) != ((1, 1) in g.nodes)
    g.sanity_check()


def test_zip_up_keeps_true_bubble_far_apart():
    # arms longer than max_len survive
    g = _graph([[(0, 0), (1, 0), (2, 0), (3, 0), (4, 0)],
                [(0, 0), (1, 1), (2, 1), (3, 1), (4, 0)]], 5,
               counts=[6, 5])
    _set_copies(g, {(0, 0): 1, (4, 0): 1})
    removed = g.zip_up_overclustering(2)
    assert removed == 0
    assert (1, 1) in g.nodes and (2, 1) in g.nodes


def test_collapse_bubble_merges_same_chunk_children():
    g = _graph([[(0, 0), (1, 0), (2, 0)], [(0, 0), (1, 1), (2, 0)]], 3,
               counts=[7, 3])
    _set_copies(g, {(0, 0): 2, (2, 0): 2})
    n = g.collapse_bubble()
    assert n == 1
    # primary (higher occ) child absorbed the other
    assert (1, 0) in g.nodes and (1, 1) not in g.nodes
    assert g.nodes[(1, 0)].occ == 10
    # edge occs merged
    e_in = g.edges_at((0, 0), TAIL)
    assert len(e_in) == 1 and e_in[0].occ == 10
    g.sanity_check()


def test_transitive_edge_reduction():
    # 0 -> 1 -> 2 plus shortcut 0 -> 2; the shortcut is transitive
    g = _graph([[(0, 0), (1, 0), (2, 0)], [(0, 0), (2, 0)]], 3,
               counts=[8, 1])
    _set_copies(g, {})
    # mark the shortcut zero-copy
    for e in g.edges_at((0, 0), TAIL):
        on, _ = g.other_end(e, (0, 0), TAIL)
        if on == (2, 0):
            e.copy_num = 0
    n = g.transitive_edge_reduction()
    assert n == 1
    assert len(g.edges) == 2
    g.sanity_check()


def test_z_edge_selection():
    # P1->C1, P2->C1, P2->C2 : the P2->C1 crossing is the Z middle
    g = _graph([[(0, 0), (2, 0)], [(1, 0), (2, 0)], [(1, 0), (3, 0)]], 4,
               counts=[5, 5, 5])
    _set_copies(g, {})
    n = g.z_edge_selection()
    assert n == 1
    # P2=(1,0) keeps only C2=(3,0); P1 keeps C1
    outs = [g.other_end(e, (1, 0), TAIL)[0]
            for e in g.edges_at((1, 0), TAIL)]
    assert outs == [(3, 0)]
    g.sanity_check()


def test_remove_zero_copy_path():
    # parent (0,0) branches: strong arm to (1,0)->(3,0), weak zero-copy arm
    # (2,0) whose destination is the same (3,0)
    g = _graph([[(0, 0), (1, 0), (3, 0)], [(0, 0), (2, 0), (3, 0)]], 4,
               counts=[10, 1])
    _set_copies(g, {(0, 0): 2, (1, 0): 2, (3, 0): 2, (2, 0): 0})
    g.remove_zero_copy_path(0.3)
    assert (2, 0) not in g.nodes
    assert (1, 0) in g.nodes
    g.sanity_check()


def test_remove_tips_zero_copy_only():
    # dead-end (2,0): zero copy, occ 1 vs local coverage ~10
    g = _graph([[(0, 0), (1, 0)], [(0, 0), (2, 0)]], 3, counts=[10, 1])
    _set_copies(g, {(0, 0): 1, (1, 0): 1, (2, 0): 0})
    n = g.remove_tips(0.8, 4)
    assert n == 1 and (2, 0) not in g.nodes
    # non-zero-copy dead ends survive
    g2 = _graph([[(0, 0), (1, 0)], [(0, 0), (2, 0)]], 3, counts=[10, 1])
    _set_copies(g2, {(0, 0): 1, (1, 0): 1, (2, 0): 1})
    assert g2.remove_tips(0.8, 4) == 0


def test_remove_zero_copy_elements():
    # X crossing: strong 0->1 and 2->3, weak zero-copy 0->3; both plugs of
    # the weak edge have a stronger alternative, so it goes
    g = _graph([[(0, 0), (1, 0)], [(2, 0), (3, 0)], [(0, 0), (3, 0)]], 4,
               counts=[10, 10, 1])
    _set_copies(g, {})
    for e in g.edges_at((0, 0), TAIL):
        on, _ = g.other_end(e, (0, 0), TAIL)
        if on == (3, 0):
            e.copy_num = 0
    g.remove_zero_copy_elements(0.8)
    assert len(g.edges) == 2
    assert all(g.other_end(e, (0, 0), TAIL)[0] == (1, 0)
               for e in g.edges_at((0, 0), TAIL))
    g.sanity_check()

    # a dead-end's sole edge is its plug's maximum -> retained even at copy 0
    g2 = _graph([[(0, 0), (1, 0)], [(0, 0), (2, 0)]], 3, counts=[10, 1])
    _set_copies(g2, {})
    for e in g2.edges_at((0, 0), TAIL):
        on, _ = g2.other_end(e, (0, 0), TAIL)
        if on == (2, 0):
            e.copy_num = 0
    g2.remove_zero_copy_elements(0.8)
    assert len(g2.edges) == 2


def test_squish_small_net():
    # two long chains cross through two 1-node paths, reconverging into two
    # long chains: an X-net; one crossing node must be squished out
    long_a = [(0, 0), (1, 0), (2, 0), (3, 0)]
    long_b = [(4, 0), (5, 0), (6, 0), (7, 0)]
    s1 = (8, 0)
    s2 = (8, 1)
    long_c = [(9, 0), (10, 0), (11, 0), (12, 0)]
    long_d = [(13, 0), (14, 0), (15, 0), (16, 0)]
    walks = []
    for s in (s1, s2):
        walks.append(long_a + [s] + long_c)
        walks.append(long_b + [s] + long_d)
        walks.append(long_a + [s] + long_d)
        walks.append(long_b + [s] + long_c)
    g = _graph(walks, 17, counts=[3] * len(walks))
    _set_copies(g, {})
    n = g.squish_small_net(3)
    assert n == 1
    assert ((8, 0) in g.nodes) != ((8, 1) in g.nodes)
    g.sanity_check()


def test_zip_up_overclustering_dev_merges_siblings():
    # same shape as collapse_bubble but driven by the reflex-sibling merge
    g = _graph([[(0, 0), (1, 0), (2, 0)], [(0, 0), (1, 1), (2, 0)]], 3,
               counts=[7, 3])
    _set_copies(g, {(0, 0): 2, (2, 0): 2})
    merged = g.zip_up_overclustering_dev()
    assert merged == 1
    assert (1, 0) in g.nodes and (1, 1) not in g.nodes
    assert g.nodes[(1, 0)].occ == 10
    assert g.nodes[(1, 0)].copy_num == 2
    g.sanity_check()


def test_simple_path_and_dest():
    g = _graph([[(0, 0), (1, 0), (2, 0), (3, 0)],
                [(0, 0), (1, 0), (2, 0), (4, 0)]], 5, counts=[5, 5])
    nodes, dests = g.simple_path_and_dest((1, 0), HEAD)
    walked = [n for n, _p in nodes]
    assert walked == [(1, 0), (2, 0)]
    assert {d for d, _p in dests} == {(3, 0), (4, 0)}
