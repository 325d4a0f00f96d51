"""Dev driver for the e2e slice with stage caching (iterate on late stages)."""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.io import sim
from jtk_tpu.io.gfa import parse_gfa
from jtk_tpu.ops.banded_align import edit_align
from jtk_tpu.stages.assemble import assemble
from jtk_tpu.stages.determine_chunks import select_chunks
from jtk_tpu.stages.local_clustering import local_clustering
from jtk_tpu.stages.multiplicity import estimate_multiplicity, purge_multiplicity
from jtk_tpu.stages.pick_component import pick_top_n_component
from jtk_tpu.stages.repeat_masking import mask_repeats
from jtk_tpu.stages.util import adjusted_rand_index

CACHE = "/tmp/e2e_cache"
os.makedirs(CACHE, exist_ok=True)
STAGE = sys.argv[1] if len(sys.argv) > 1 else "all"


def checkpoint(name, fn):
    path = f"{CACHE}/{name}.pkl"
    if os.path.exists(path) and STAGE != "fresh":
        with open(path, "rb") as f:
            return pickle.load(f)
    t0 = time.time()
    out = fn()
    print(f"[{name}] {time.time()-t0:.1f}s", flush=True)
    with open(path, "wb") as f:
        pickle.dump(out, f)
    return out


rng = np.random.default_rng(7)
hap1 = sim.random_genome(rng, 6000)
hap2 = hap1.copy()
n_snv = 90
snv_pos = rng.choice(np.arange(100, 5900), n_snv, replace=False)
for p in snv_pos:
    hap2[p] = (hap2[p] + 1 + rng.integers(0, 3)) % 4
reads = sim.simulate_reads(rng, [hap1, hap2], coverage=16, mean_len=2200,
                           error=0.05)


def upto_cluster():
    ds = sim.reads_to_dataset(reads)
    mask_repeats(ds)
    select_chunks(ds, chunk_len=500, take_num=18, margin=100, seed=11,
                  encode_kwargs=dict(margin=100))
    pick_top_n_component(ds, 1)
    estimate_multiplicity(ds)
    purge_multiplicity(ds, 10)
    local_clustering(ds, seed=5, flips_per_read=600, restarts=8)
    return ds


ds = checkpoint("clustered", upto_cluster)

print("chunks:", [(c.id, c.cluster_num, c.copy_num, round(c.score, 1))
                  for c in ds.selected_chunks])
for c in ds.selected_chunks:
    asn, truth = [], []
    for er in ds.encoded_reads:
        for n in er.nodes:
            if n.chunk == c.id:
                asn.append(n.cluster)
                truth.append(reads[er.id]["hap"])
    print(f"  chunk {c.id}: cov={len(asn)} k={c.cluster_num} "
          f"ari={adjusted_rand_index(truth, asn):.2f}")

gfa = assemble(ds)
segs, links = parse_gfa(gfa)
print(f"{len(segs)} segments, {len(links)} links")
from jtk_tpu.io.eval import contig_error_rate
for name, rec in segs.items():
    if len(rec["seq"]) < 100:
        print(name, len(rec["seq"]), "(short)")
        continue
    e = contig_error_rate(rec["seq"], [hap1, hap2])
    print(name, len(rec["seq"]), "cp:", rec["tags"].get("cp"),
          "err:", round(e, 4))

if STAGE == "polish":
    from jtk_tpu.stages.assemble import build_graph, clean_up_graph_for_assemble
    from jtk_tpu.stages.consensus import polish_contigs
    g = build_graph(ds)
    clean_up_graph_for_assemble(g, ds.coverage.unwrap())
    contigs = [c for c in g.spell() if len(c["seq"]) > 200]
    polish_contigs(ds, contigs)
    for i, c in enumerate(contigs):
        e = contig_error_rate(c["seq"], [hap1, hap2])
        print("polished", i, len(c["seq"]), "err:", round(e, 4))
