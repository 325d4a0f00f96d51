"""Golden determinism: the same seeded pipeline must produce byte-identical
GFA on a 1-device and an 8-virtual-device CPU mesh (SURVEY.md §4 implication
(e)).  Sharded stages keep per-item independence and the train step reduces
gathered per-read gradients in a replicated fixed-shape sum, so mesh size
must not leak into the numerics."""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import numpy as np
from jtk_tpu import seq as seqmod
from jtk_tpu.io import sim
from jtk_tpu.stages.assemble import assemble
from jtk_tpu.stages.determine_chunks import select_chunks
from jtk_tpu.stages.local_clustering import local_clustering
from jtk_tpu.stages.model_tune import update_models_on_both_strands
from jtk_tpu.stages.multiplicity import estimate_multiplicity, purge_multiplicity
from jtk_tpu.stages.pick_component import pick_top_n_component
from jtk_tpu.stages.repeat_masking import mask_repeats

rng = np.random.default_rng(7)
hap1 = sim.random_genome(rng, 4000)
hap2 = hap1.copy()
for p in rng.choice(np.arange(100, 3900), 60, replace=False):
    hap2[p] = (hap2[p] + 1 + rng.integers(0, 3)) % 4
reads = sim.simulate_reads(rng, [hap1, hap2], coverage=14, mean_len=1800,
                           error=0.05)
ds = sim.reads_to_dataset(reads)
mask_repeats(ds)
select_chunks(ds, chunk_len=500, take_num=10, margin=100, seed=11,
              encode_kwargs=dict(margin=100))
pick_top_n_component(ds, 1)
estimate_multiplicity(ds)
purge_multiplicity(ds, 10)
update_models_on_both_strands(ds, polish_rounds=1)
local_clustering(ds, seed=5, flips_per_read=400, restarts=6)
gfa = assemble(ds, to_polish=False)
import sys
sys.stdout.write(gfa)
"""


@pytest.mark.slow
def test_gfa_identical_at_1_and_8_devices(tmp_path):
    outs = {}
    for ndev in (1, 8):
        from envutil import cpu_subprocess_env
        env = cpu_subprocess_env(ndev)
        res = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                             cwd=os.path.dirname(os.path.dirname(__file__)),
                             capture_output=True, text=True, timeout=3000)
        assert res.returncode == 0, res.stderr[-3000:]
        outs[ndev] = res.stdout
    assert outs[1] == outs[8], (
        "GFA diverges between mesh sizes:\n"
        f"--- 1 device ---\n{outs[1][:2000]}\n"
        f"--- 8 devices ---\n{outs[8][:2000]}")
    assert outs[1].count("\nS\t") + outs[1].startswith("S\t") >= 1
