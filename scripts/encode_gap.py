"""Account for the encode node-count gap vs the CPU harness (VERDICT r4 #5).

Generates the exact bench dataset, runs native/encode_bench with --dump to
get the CPU harness's accepted (read, chunk, strand) set, runs the
production encode (same machine, any backend), and reports:
  * pairs accepted by BOTH;
  * CPU-only pairs, split into (a) duplicates of a pair the TPU path kept
    (the harness applies no dedup; encode's remove_slippy/overlap cleanup
    does) and (b) genuinely missed placements;
  * TPU-only pairs.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/encode_gap.py
"""

import collections
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(name)s: %(message)s")
    from jtk_tpu import seq as seqmod
    from jtk_tpu.datamodel import Chunk
    from jtk_tpu.io import sim
    from jtk_tpu.stages.encode import encode

    rng = np.random.default_rng(42)
    genome_len = int(os.environ.get("JTK_BENCH_REGION", 200_000))
    hap1, hap2 = sim.diploid(rng, genome_len, het=0.001)
    reads = sim.simulate_reads(rng, [hap1, hap2], coverage=24,
                               mean_len=18_000, error=0.05)
    ds = sim.reads_to_dataset(reads)
    chunk_len, marg = 2000, 500
    starts = list(range(marg, genome_len - chunk_len - marg,
                        chunk_len + marg))
    ds.selected_chunks = [
        Chunk(i, seqmod.decode(hap1[s:s + chunk_len]).decode())
        for i, s in enumerate(starts)
    ]
    d = tempfile.mkdtemp()
    with open(f"{d}/reads.fa", "w") as f:
        for r in ds.raw_reads:
            f.write(f">{r.name}\n{r.seq}\n")
    with open(f"{d}/chunks.fa", "w") as f:
        for c in ds.selected_chunks:
            f.write(f">c{c.id}\n{c.seq}\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    binary = os.path.join(repo, "native", "encode_bench")
    out = subprocess.run([binary, f"{d}/reads.fa", f"{d}/chunks.fa",
                          f"{d}/dump.tsv"], capture_output=True, text=True,
                         timeout=1200)
    print("cpu:", out.stdout.strip(), file=sys.stderr)
    cpu_multi = collections.Counter()
    for line in open(f"{d}/dump.tsv"):
        ri, ci, strand, _dmed, _dist = line.split()
        cpu_multi[(int(ri), int(ci))] += 1
    encode(ds)
    tpu = {(er.id, n.chunk) for er in ds.encoded_reads for n in er.nodes}
    tpu_nodes = sum(len(er.nodes) for er in ds.encoded_reads)
    cpu = set(cpu_multi)
    both = cpu & tpu
    cpu_only = cpu - tpu
    tpu_only = tpu - cpu
    dup_accepts = sum(c - 1 for c in cpu_multi.values())
    rec = {
        "cpu_accept_events": sum(cpu_multi.values()),
        "cpu_distinct_pairs": len(cpu),
        "cpu_duplicate_accepts": dup_accepts,
        "tpu_nodes": tpu_nodes,
        "tpu_distinct_pairs": len(tpu),
        "both": len(both),
        "cpu_only_pairs": len(cpu_only),
        "tpu_only_pairs": len(tpu_only),
        "tpu_recall_of_cpu_pairs": round(len(both) / max(len(cpu), 1), 4),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
