"""Medium-scale validation: 60 kb diploid region, 60x ONT-sim, full pipeline.

Runs on the real TPU (COX_PGF-shaped workload at 1/80 scale); reports
per-stage wall-clock, per-chunk phasing ARI, and contig identity vs truth —
the three driver metrics (reads-encoded/s is bench.py).
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
    from jtk_tpu import seq as seqmod
    from jtk_tpu.io import sim
    from jtk_tpu.io.eval import assembly_metrics
    from jtk_tpu.pipeline import PipelineConfig, run_pipeline
    from jtk_tpu.stages.util import adjusted_rand_index

    rng = np.random.default_rng(2026)
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    cov = float(sys.argv[2]) if len(sys.argv) > 2 else 30
    hap1, hap2 = sim.diploid(rng, L, het=0.004)
    reads = sim.simulate_reads(rng, [hap1, hap2], coverage=cov,
                               mean_len=15_000, error=0.05, clip_ends=True)
    # per-(L, cov) work dir: resume=True must never pick up checkpoints from
    # a DIFFERENT dataset scale
    out = f"/tmp/validate_{L}_{int(cov)}"
    os.makedirs(out, exist_ok=True)
    fa = f"{out}/reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">sim_{i}\n{seqmod.decode(r['codes']).decode()}\n")
    ckpt = os.environ.get("VALIDATE_CKPT", "json")
    cfg = PipelineConfig(input_file=fa, read_type="ONT", out_dir=out,
                         prefix="v", region_size=str(L), seed=13,
                         to_polish=True, resume=True,
                         checkpoint_format=ckpt)
    t0 = time.time()
    gfa_path = run_pipeline(cfg)
    wall = time.time() - t0
    import resource
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    stage_s = {}
    try:
        for line in open(f"{out}/v.timings.tsv"):
            k, v = line.rstrip("\n").split("\t")
            if k != "phase":
                stage_s[k] = float(v)
    except FileNotFoundError:
        pass
    m = assembly_metrics(open(gfa_path).read(), [hap1, hap2])
    # phasing ARI per chunk
    from jtk_tpu.datamodel import DataSet
    cl = f"{out}/v.clustered.{'npz' if ckpt == 'npz' else 'json'}"
    if not os.path.exists(cl):
        cl = f"{out}/v.clustered.json"
    ds = DataSet.load(cl)
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
    rec = {
        "region": L, "coverage": cov, "n_reads": len(reads),
        "wall_s": round(wall, 1),
        "stage_s": stage_s,
        "peak_rss_mb": round(peak_rss_mb, 1),
        "phased_chunks": len(aris),
        "total_chunks": len(ds.selected_chunks),
        "mean_phasing_ari": round(float(np.mean(aris)), 3) if aris else None,
        "contigs": len(m["contigs"]),
        "assembly_len": m["total_len"],
        "mean_contig_error": round(m["mean_error"], 5),
    }
    print(json.dumps(rec))
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(rec, f)


if __name__ == "__main__":
    main()
