"""Data-model invariants: JSON round trip, lossless read recovery, node removal.

Mirrors the reference's sanity checks (definitions/src/lib.rs:296-358) and the
node-removal losslessness property (definitions/src/lib.rs:540-603).
"""

import random

import numpy as np
import pytest

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import (
    Chunk, DataSet, Edge, EncodedRead, Node, RawRead, ReadType,
    ops_from_str, ops_to_str, ops_query_length,
)


def test_seq_encode_decode_roundtrip():
    s = b"ACGTacgtNn"
    codes = seqmod.encode(s)
    assert list(codes) == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4]
    lower = seqmod.mask_bits(s)
    assert list(lower) == [False] * 4 + [True] * 4 + [False, False]
    assert seqmod.decode(codes[:8], lower[:8]) == b"ACGTacgt"


def test_revcomp():
    assert seqmod.revcomp_ascii(b"ACGTT") == b"AACGT"


def test_ops_string_roundtrip():
    ops = [("M", 120), ("D", 2), ("M", 30), ("I", 1)]
    s = ops_to_str(ops)
    assert s == "120M2D30M1I"
    assert ops_from_str(s) == ops
    assert ops_query_length(ops) == 151


def _random_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _make_encoded(rng, read_seq, chunks, positions):
    """Fabricate an encoded read placing each chunk at the given position with a
    perfect (all-match) alignment."""
    nodes = []
    for ch, pos in zip(chunks, positions):
        sub = read_seq[pos:pos + len(ch.seq)]
        nodes.append(Node.new(ch.id, True, sub, [("M", len(sub))], pos, 2))
    edges = [Edge.from_nodes(a, b, read_seq) for a, b in zip(nodes, nodes[1:])]
    lead = read_seq[: positions[0]]
    trail = read_seq[positions[-1] + nodes[-1].query_length():]
    return EncodedRead(0, len(read_seq), lead, trail, edges, nodes)


def test_lossless_recovery_and_removal():
    rng = random.Random(42)
    read_seq = _random_seq(rng, 1000)
    chunks = [Chunk(i, read_seq[p:p + 100]) for i, p in enumerate([50, 120, 400, 700])]
    er = _make_encoded(rng, read_seq, chunks, [50, 120, 400, 700])
    assert er.recover_raw_read() == read_seq
    # overlapping nodes (negative offset) also recover
    er2 = _make_encoded(rng, read_seq, chunks[:2], [50, 120])
    assert er2.edges[0].offset == 120 - 150
    assert er2.recover_raw_read() == read_seq
    # removal at every position keeps losslessness
    for i in range(4):
        er3 = _make_encoded(rng, read_seq, chunks, [50, 120, 400, 700])
        er3.remove(i)
        assert er3.recover_raw_read() == read_seq, f"removal of node {i}"
    # removing everything folds into leading gap
    er4 = _make_encoded(rng, read_seq, chunks, [50, 120, 400, 700])
    for _ in range(4):
        er4.remove(0)
    assert er4.recover_raw_read() == read_seq


def test_dataset_json_roundtrip():
    rng = random.Random(7)
    read_seq = _random_seq(rng, 500)
    raw = RawRead("r0", "", 0, read_seq)
    chunk = Chunk(0, read_seq[100:200], cluster_num=1, copy_num=2)
    node = Node.new(0, True, read_seq[100:200], [("M", 100)], 100, 2)
    er = EncodedRead(0, 500, read_seq[:100], read_seq[200:], [], [node])
    ds = DataSet.with_minimum_data("in.fa", [raw], ReadType.ONT)
    ds.selected_chunks = [chunk]
    ds.encoded_reads = [er]
    ds.coverage.set(30.0)
    ds.push_stage("entry", [])
    ds.sanity_check()

    s = ds.dumps()
    ds2 = DataSet.loads(s)
    ds2.sanity_check()
    assert ds2.read_type == "ONT"
    assert ds2.coverage.unwrap() == 30.0
    assert ds2.raw_reads[0].seq == read_seq
    assert ds2.encoded_reads[0].nodes[0].cigar == [("M", 100)]
    assert ds2.dumps() == s


def test_coverage_enum_json_shapes():
    from jtk_tpu.datamodel import Coverage
    assert Coverage().to_json() == "NotAvailable"
    assert Coverage(5.0, True).to_json() == {"Protected": 5.0}
    assert Coverage(5.0, False).to_json() == {"Estimated": 5.0}
    assert Coverage.from_json({"Protected": 2.0}).protected


def test_sanity_check_detects_violation():
    rng = random.Random(3)
    read_seq = _random_seq(rng, 300)
    raw = RawRead("r0", "", 0, read_seq)
    ds = DataSet.with_minimum_data("x.fa", [raw], ReadType.ONT)
    ds.selected_chunks = [Chunk(0, "ACGT", cluster_num=3, copy_num=2)]
    with pytest.raises(AssertionError):
        ds.sanity_check()


def test_readtype_presets():
    assert ReadType.band_width("ONT", 2000) == 60
    assert ReadType.sim_thr("ONT") == 0.15
    assert ReadType.min_span_reads("ONT") == 2


def test_npz_snapshot_roundtrip(tmp_path):
    """Columnar npz snapshot (SURVEY §2.1) must round-trip exactly."""
    from jtk_tpu.datamodel import (Chunk, DataSet, Edge, EncodedRead, Node,
                                   RawRead)
    ds = DataSet(read_type="ONT", input_file="x.fa")
    ds.raw_reads = [RawRead("r0", "d", 0, "ACGTACGTAA"),
                    RawRead("r1", "", 1, "GGGTTTAAAC")]
    ds.selected_chunks = [Chunk(0, "ACGT", 2, 3, 1.5)]
    n = Node(2, 0, 1, "ACGT", False, [("M", 3), ("I", 1)], [-0.1, -2.3])
    ds.encoded_reads = [EncodedRead(0, 10, "AC", "AA",
                                    [], [n]),
                        EncodedRead(1, 10, "GGGTTTAAAC", "", [], [])]
    ds.push_stage("Entry", ["x"])
    p = str(tmp_path / "ds.npz")
    ds.dump(p)
    ds2 = DataSet.load(p)
    assert ds2.dumps() == ds.dumps()

    # two-node read with an edge
    n2 = Node(7, 0, 0, "GTAC", True, [("M", 4)], [0.0])
    ds.encoded_reads[0].nodes.append(n2)
    ds.encoded_reads[0].edges.append(Edge(0, 0, 1, "G"))
    ds.dump(p)
    assert DataSet.load(p).dumps() == ds.dumps()
