"""Full-pipeline integration: FASTA -> TOML config -> run_pipeline -> GFA,
with checkpoint files and resume (cli/src/pipeline.rs behavior)."""

import os

import numpy as np
import pytest

from jtk_tpu.io import sim
from jtk_tpu.pipeline import PipelineConfig, run_pipeline


@pytest.mark.slow
def test_run_pipeline_end_to_end(tmp_path):
    rng = np.random.default_rng(11)
    hap1 = sim.random_genome(rng, 6000)
    hap2 = hap1.copy()
    snv = rng.choice(np.arange(100, 5900), 90, replace=False)
    for p in snv:
        hap2[p] = (hap2[p] + 1 + rng.integers(0, 3)) % 4
    reads = sim.simulate_reads(rng, [hap1, hap2], coverage=16, mean_len=2200,
                               error=0.05)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        from jtk_tpu import seq as seqmod
        for i, r in enumerate(reads):
            f.write(f">sim_{i}\n{seqmod.decode(r['codes']).decode()}\n")
    cfg = PipelineConfig(
        input_file=str(fa), read_type="ONT", out_dir=str(tmp_path),
        prefix="t", region_size="6k", chunk_len=500, margin=100, seed=3,
        to_polish=True, polish_window_size=1000)
    gfa_path = run_pipeline(cfg)
    assert os.path.exists(gfa_path)
    for name in ("t.entry.json", "t.encoded.json", "t.clustered.json",
                 "t.de.json", "t.json"):
        assert os.path.exists(tmp_path / name), name
    with open(gfa_path) as f:
        gfa = f.read()
    from jtk_tpu.io.eval import assembly_metrics
    m = assembly_metrics(gfa, [hap1, hap2])
    assert m["total_len"] > 3500, m
    assert m["mean_error"] < 0.02, m
    # resume: phases short-circuit from checkpoints
    cfg.resume = True
    gfa2 = run_pipeline(cfg)
    assert os.path.exists(gfa2)
