"""Benchmark: reads-encoded/s on a synthetic diploid dataset (real TPU).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no throughput numbers (BASELINE.md) and its Rust
toolchain is absent from this image, so ``vs_baseline`` is computed against a
documented ESTIMATE of the reference encode stage's single-thread throughput
(minimap2 + per-alignment edlib/kiley refinement): ~30 reads/s for ~20 kbp ONT
reads.  Replace with a measured number when a reference binary is available.
"""

import json
import os
import sys
import time

import numpy as np

REF_READS_PER_S_ESTIMATE = 30.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from jtk_tpu import seq as seqmod
    from jtk_tpu.datamodel import Chunk
    from jtk_tpu.io import sim
    from jtk_tpu.stages.encode import encode

    rng = np.random.default_rng(42)
    genome_len = 200_000
    hap1, hap2 = sim.diploid(rng, genome_len, het=0.001)
    reads = sim.simulate_reads(rng, [hap1, hap2], coverage=24,
                               mean_len=18_000, error=0.05)
    ds = sim.reads_to_dataset(reads)
    # chunk set: windows of hap1 at 2 kbp (chunk selection benched separately)
    chunk_len, marg = 2000, 500
    starts = list(range(marg, genome_len - chunk_len - marg, chunk_len + marg))
    ds.selected_chunks = [
        Chunk(i, seqmod.decode(hap1[s:s + chunk_len]).decode())
        for i, s in enumerate(starts)
    ]

    # warmup (compile) on a small slice
    import copy
    warm = copy.deepcopy(ds)
    warm.raw_reads = warm.raw_reads[:8]
    t0 = time.time()
    encode(warm)
    print(f"warmup(compile): {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    encode(ds)
    dt = time.time() - t0
    n_reads = len(ds.raw_reads)
    n_nodes = sum(len(r.nodes) for r in ds.encoded_reads)
    reads_per_s = n_reads / dt
    print(f"encoded {n_reads} reads ({n_nodes} nodes) in {dt:.1f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "reads_encoded_per_s",
        "value": round(reads_per_s, 2),
        "unit": "reads/s (18kbp ONT-sim, 100kb diploid region)",
        "vs_baseline": round(reads_per_s / REF_READS_PER_S_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
