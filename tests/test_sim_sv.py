"""SV/repeat genome generators + e2e repeat resolution.

The reference validates repeat handling on simulated segdup/SV genomes
(sandbox/src/bin/gen_sim_genome{,_segdup}.rs); here the same harness feeds an
end-to-end run where a two-copy shared repeat separates the haplotypes only
via spanning reads, so focus-based resolution must fire
(repeat_resolve_by_focus.rs:90-246,342-481).
"""

import logging

import numpy as np
import pytest

from jtk_tpu import seq as seqmod
from jtk_tpu.io import sim


def test_segdup_diploid_shapes_and_divergence():
    rng = np.random.default_rng(0)
    hap_a, hap_b = sim.segdup_diploid(rng, segdup_len=5000, padding=1000,
                                      divergence=0.05, het=0.001)
    # layout: 1000 + 5000 + 1000 + ~5000 + 1000
    assert abs(len(hap_a) - 13000) < 300
    assert abs(len(hap_b) - len(hap_a)) < 150
    # the two segdup copies align with ~5% divergence, not identity
    copy1 = hap_a[1000:6000]
    copy2 = hap_a[7000:12000]
    mism = np.mean(copy1[:4000] != copy2[:4000])
    assert 0.02 < mism  # diverged (alignment-free lower bound)


def test_sv_diploid_structure():
    rng = np.random.default_rng(1)
    ref, hap_a, hap_b = sim.sv_diploid(rng, length=100_000, het=0.0)
    # hapA: deletions (3k+2k+5k) + 5k insertion = net -5k
    assert abs(len(hap_a) - (100_000 - 10_000 + 5_000)) < 10
    # hapB keeps the third segment and gains a second insertion: net +5k
    assert abs(len(hap_b) - (100_000 - 5_000 + 10_000)) < 10
    # the inversion: hapA carries revcomp(ref[32k:37k])
    inv = seqmod.revcomp(ref[32_000:37_000])
    hay = hap_a.tobytes()
    assert inv.tobytes() in hay
    assert ref[32_000:37_000].tobytes() not in hay


def test_shared_repeat_diploid_snvs_only_in_unique_regions():
    rng = np.random.default_rng(2)
    hap1, hap2, snv = sim.shared_repeat_diploid(rng, flank=800,
                                                repeat_len=400, mid=800)
    assert len(hap1) == len(hap2) == 800 + 400 + 800 + 400 + 800
    diffs = np.nonzero(hap1 != hap2)[0]
    assert set(diffs) == set(snv)
    # no SNV inside either repeat copy
    for p in diffs:
        assert not (800 <= p < 1200)
        assert not (2000 <= p < 2400)


@pytest.mark.slow
def test_e2e_shared_repeat_resolved_by_foci(caplog):
    """A 2-copy exact repeat flanked by phased unique sequence: the collapsed
    repeat chunks must be resolved by spanning reads (FOCUS events), and the
    assembly must recover both haplotypes at near-full length."""
    from jtk_tpu.io.eval import assembly_metrics
    from jtk_tpu.stages.assemble import assemble
    from jtk_tpu.stages.determine_chunks import select_chunks
    from jtk_tpu.stages.local_clustering import local_clustering
    from jtk_tpu.stages.multiplicity import (estimate_multiplicity,
                                             purge_multiplicity)
    from jtk_tpu.stages.pick_component import pick_top_n_component
    from jtk_tpu.stages.repeat_masking import mask_repeats

    rng = np.random.default_rng(13)
    hap1, hap2, _snv = sim.shared_repeat_diploid(
        rng, flank=1800, repeat_len=900, mid=1800, n_snv=60)
    reads = sim.simulate_reads(rng, [hap1, hap2], coverage=20, mean_len=2600,
                               error=0.05, min_len=1200, clip_ends=True)
    ds = sim.reads_to_dataset(reads)
    mask_repeats(ds)
    select_chunks(ds, chunk_len=500, take_num=20, margin=100, seed=11,
                  encode_kwargs=dict(margin=100))
    ds.sanity_check()
    pick_top_n_component(ds, 1)
    estimate_multiplicity(ds)
    purge_multiplicity(ds, 10)
    # the repeat must have collapsed into multi-copy chunks
    assert any((c.copy_num or 1) > 2 for c in ds.selected_chunks), \
        [(c.id, c.copy_num) for c in ds.selected_chunks]
    local_clustering(ds, seed=5, flips_per_read=600, restarts=8)
    with caplog.at_level(logging.INFO, logger="jtk_tpu.graph.foci"):
        gfa = assemble(ds)
    focus_events = [r for r in caplog.records if "FOCUS" in r.getMessage()]
    assert focus_events, "no FOCUS resolution fired"
    m = assembly_metrics(gfa, [hap1, hap2])
    # both haplotypes recovered: combined contig length near 2 genomes
    assert m["total_len"] > 1.2 * len(hap1), m
    assert m["mean_error"] < 0.05, m
