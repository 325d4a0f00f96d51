"""Score an already-produced validation GFA against the seeded truth.

Usage: python scripts/eval_existing.py <L> <cov> [out.json]

Regenerates the deterministic truth haplotypes/reads used by
``validate_medium.py`` (same rng seed 2026) and evaluates the existing
``/tmp/validate_{L}_{cov}/v.gfa`` + phasing ARI without rerunning the
pipeline.  Reference metric: ``sandbox/src/bin/compare_haplotypes.rs``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s %(name)s: %(message)s")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    from jtk_tpu.io import sim
    from jtk_tpu.io.eval import assembly_metrics
    from jtk_tpu.stages.util import adjusted_rand_index

    rng = np.random.default_rng(2026)
    L = int(sys.argv[1])
    cov = float(sys.argv[2])
    hap1, hap2 = sim.diploid(rng, L, het=0.004)
    reads = sim.simulate_reads(rng, [hap1, hap2], coverage=cov,
                               mean_len=15_000, error=0.05, clip_ends=True)
    out = f"/tmp/validate_{L}_{int(cov)}"
    t0 = time.time()
    m = assembly_metrics(open(f"{out}/v.gfa").read(), [hap1, hap2])
    print(f"align eval: {time.time()-t0:.1f}s", file=sys.stderr)
    from jtk_tpu.datamodel import DataSet
    ds = DataSet.load(f"{out}/v.clustered.json")
    aris = []
    for c in ds.selected_chunks:
        if c.cluster_num < 2:
            continue
        asn, truth = [], []
        for er in ds.encoded_reads:
            for n in er.nodes:
                if n.chunk == c.id:
                    asn.append(n.cluster)
                    truth.append(reads[er.id]["hap"])
        aris.append(adjusted_rand_index(truth, asn))
    stage_s = {}
    try:
        for line in open(f"{out}/v.timings.tsv"):
            k, v = line.rstrip("\n").split("\t")
            if k != "phase":
                stage_s[k] = float(v)
    except FileNotFoundError:
        pass
    rec = {
        "region": L, "coverage": cov, "n_reads": len(reads),
        "stage_s": stage_s,
        "phased_chunks": len(aris),
        "total_chunks": len(ds.selected_chunks),
        "mean_phasing_ari": round(float(np.mean(aris)), 3) if aris else None,
        "contigs": len(m["contigs"]),
        "assembly_len": m["total_len"],
        "mean_contig_error": round(m["mean_error"], 6),
        "per_contig": {k: {"len": v["len"], "error": round(v["error"], 6)}
                       for k, v in m["contigs"].items()},
    }
    print(json.dumps(rec))
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(rec, f)


if __name__ == "__main__":
    main()
