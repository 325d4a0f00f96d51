"""Create the /tmp/pipe verify fixture: synthetic diploid reads + profile.toml.

Used by .claude/skills/verify — `python -m jtk_tpu.cli pipeline -p
/tmp/pipe/profile.toml` then truth-check t.gfa against hap{1,2}.npy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.io import sim

OUT = "/tmp/pipe"


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(11)
    hap1 = sim.random_genome(rng, 6000)
    hap2 = hap1.copy()
    snv = rng.choice(np.arange(100, 5900), 90, replace=False)
    for p in snv:
        hap2[p] = (hap2[p] + 1 + rng.integers(0, 3)) % 4
    reads = sim.simulate_reads(rng, [hap1, hap2], coverage=16, mean_len=2200,
                               error=0.05)
    with open(f"{OUT}/reads.fa", "w") as f:
        for i, r in enumerate(reads):
            f.write(f">sim_{i}\n{seqmod.decode(r['codes']).decode()}\n")
    np.save(f"{OUT}/hap1.npy", hap1)
    np.save(f"{OUT}/hap2.npy", hap2)
    with open(f"{OUT}/profile.toml", "w") as f:
        f.write(f"""input_file = "{OUT}/reads.fa"
read_type = "ONT"
out_dir = "{OUT}"
prefix = "t"
region_size = "6k"
chunk_len = 500
margin = 100
seed = 3
to_polish = true
polish_window_size = 1000
resume = true
""")
    print(f"fixture written to {OUT}")


if __name__ == "__main__":
    main()
