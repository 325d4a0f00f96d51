"""Local clustering on a synthetic diploid pileup (benchmark_clustering-style:
two haplotypes with planted SNVs, ~30x, 5-10% error; expect ARI > 0.8)."""

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import Chunk, DataSet, EncodedRead, Node, RawRead, ReadType
from jtk_tpu.io import sim
from jtk_tpu.stages.local_clustering import local_clustering
from jtk_tpu.stages.util import adjusted_rand_index


def _build_pileup_dataset(rng, tlen=400, n_var=4, cov_per_hap=16, error=0.06):
    hap0 = sim.random_genome(rng, tlen)
    hap1 = hap0.copy()
    var_pos = rng.choice(np.arange(20, tlen - 20), size=n_var, replace=False)
    for p in var_pos:
        hap1[p] = (hap1[p] + 1 + rng.integers(0, 3)) % 4
    ds = DataSet.with_minimum_data("sim.fa", [], ReadType.ONT)
    chunk = Chunk(0, seqmod.decode(hap0).decode(), cluster_num=1, copy_num=2)
    ds.selected_chunks = [chunk]
    truth = []
    for i in range(2 * cov_per_hap):
        h = i % 2
        codes = sim.noisy_read(rng, [hap0, hap1][h], error)
        seq = seqmod.decode(codes).decode()
        ds.raw_reads.append(RawRead(f"r{i}", "", i, seq))
        node = Node.new(0, bool(i % 4 < 2), seq, [("M", len(seq))], 0, 1)
        ds.encoded_reads.append(EncodedRead(i, len(seq), "", "", [], [node]))
        truth.append(h)
    return ds, np.array(truth)


def test_local_clustering_separates_haplotypes():
    rng = np.random.default_rng(0)
    ds, truth = _build_pileup_dataset(rng)
    local_clustering(ds, seed=42, flips_per_read=600, restarts=8)
    chunk = ds.selected_chunks[0]
    assert chunk.cluster_num == 2, chunk.cluster_num
    assert chunk.score > 0
    assigns = np.array([er.nodes[0].cluster for er in ds.encoded_reads])
    ari = adjusted_rand_index(truth, assigns)
    assert ari > 0.8, ari
    # posteriors should be valid log-probs of length cluster_num
    for er in ds.encoded_reads:
        post = er.nodes[0].posterior
        assert len(post) == 2
        assert abs(np.logaddexp(*post)) < 1e-6


def test_local_clustering_no_variants_single_cluster():
    rng = np.random.default_rng(1)
    tlen = 300
    hap = sim.random_genome(rng, tlen)
    ds = DataSet.with_minimum_data("sim.fa", [], ReadType.ONT)
    ds.selected_chunks = [Chunk(0, seqmod.decode(hap).decode(), 1, 2)]
    for i in range(20):
        codes = sim.noisy_read(rng, hap, 0.05)
        seq = seqmod.decode(codes).decode()
        ds.raw_reads.append(RawRead(f"r{i}", "", i, seq))
        node = Node.new(0, True, seq, [("M", len(seq))], 0, 1)
        ds.encoded_reads.append(EncodedRead(i, len(seq), "", "", [], [node]))
    local_clustering(ds, seed=3, flips_per_read=400, restarts=6)
    assert ds.selected_chunks[0].cluster_num == 1


def test_tandem_dup_haplotypes_phase():
    """Two haplotypes differing only by a 3bp tandem duplication phase
    correctly — exercises the COPY edit rows of the modification table."""
    from jtk_tpu.ops import oracle
    rng = np.random.default_rng(7)
    tlen = 400
    hap0 = sim.random_genome(rng, tlen)
    hap1 = oracle.apply_edit(hap0, "C", 198, 3)
    ds = DataSet.with_minimum_data("sim.fa", [], ReadType.ONT)
    ds.selected_chunks = [Chunk(0, seqmod.decode(hap0).decode(), 1, 2)]
    truth = []
    for i in range(36):
        h = i % 2
        codes = sim.noisy_read(rng, [hap0, hap1][h], 0.04)
        seq = seqmod.decode(codes).decode()
        ds.raw_reads.append(RawRead(f"r{i}", "", i, seq))
        node = Node.new(0, bool(i % 4 < 2), seq, [("M", len(seq))], 0, 1)
        ds.encoded_reads.append(EncodedRead(i, len(seq), "", "", [], [node]))
        truth.append(h)
    local_clustering(ds, seed=9, flips_per_read=600, restarts=8)
    assigns = np.array([er.nodes[0].cluster for er in ds.encoded_reads])
    ari = adjusted_rand_index(np.array(truth), assigns)
    assert ds.selected_chunks[0].cluster_num == 2
    assert ari > 0.7, ari


def test_recursive_clustering_high_copy():
    """copy_num >= 8 goes through the recursive 4-way split and still finds
    the planted structure."""
    rng = np.random.default_rng(13)
    tlen = 300
    base = sim.random_genome(rng, tlen)
    haps = []
    for h in range(8):
        hap = base.copy()
        # plant 4 distinct SNVs per haplotype (diverged copies of a repeat)
        for p in rng.choice(np.arange(20, tlen - 20), size=4, replace=False):
            hap[p] = (hap[p] + 1 + rng.integers(0, 3)) % 4
        haps.append(hap)
    ds = DataSet.with_minimum_data("sim.fa", [], ReadType.ONT)
    ds.selected_chunks = [Chunk(0, seqmod.decode(base).decode(),
                                cluster_num=1, copy_num=8)]
    # a single 8-copy chunk breaks the median/2 haploid-coverage heuristic;
    # protect the true per-copy coverage (10) like the reference's TOML does
    ds.coverage.value = 10.0
    ds.coverage.protected = True
    truth = []
    for i in range(8 * 10):
        h = i % 8
        codes = sim.noisy_read(rng, haps[h], 0.04)
        seq = seqmod.decode(codes).decode()
        ds.raw_reads.append(RawRead(f"r{i}", "", i, seq))
        node = Node.new(0, bool(i % 4 < 2), seq, [("M", len(seq))], 0, 1)
        ds.encoded_reads.append(EncodedRead(i, len(seq), "", "", [], [node]))
        truth.append(h)
    local_clustering(ds, seed=21, flips_per_read=500, restarts=6)
    chunk = ds.selected_chunks[0]
    assert chunk.cluster_num >= 4, chunk.cluster_num
    assigns = np.array([er.nodes[0].cluster for er in ds.encoded_reads])
    ari = adjusted_rand_index(np.array(truth), assigns)
    assert ari > 0.5, (ari, chunk.cluster_num)
    for er in ds.encoded_reads:
        assert len(er.nodes[0].posterior) == chunk.cluster_num
