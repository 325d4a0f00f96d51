"""Debug the contig polisher window-by-window on cached e2e state."""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from jtk_tpu import seq as seqmod
from jtk_tpu.io import sim
from jtk_tpu.io.eval import locate_and_align
from jtk_tpu.stages.assemble import build_graph, clean_up_graph_for_assemble
from jtk_tpu.stages.consensus import _read_anchors, _window_segment
from jtk_tpu.ops.phmm import PHMMParams
from jtk_tpu.ops.polish import polish_until_converge

with open("/tmp/e2e_cache/clustered.pkl", "rb") as f:
    ds = pickle.load(f)

rng = np.random.default_rng(7)
hap1 = sim.random_genome(rng, 6000)
hap2 = hap1.copy()
snv_pos = rng.choice(np.arange(100, 5900), 90, replace=False)
for p in snv_pos:
    hap2[p] = (hap2[p] + 1 + rng.integers(0, 3)) % 4

g = build_graph(ds)
clean_up_graph_for_assemble(g, ds.coverage.unwrap())
contigs = [c for c in g.spell() if len(c["seq"]) > 200]
per_contig = _read_anchors(ds, contigs)
read_codes = [seqmod.encode(er.recover_raw_read()) for er in ds.encoded_reads]
params = PHMMParams.from_hmmparam(ds.model_param.forward)

ci = 2 if len(contigs) > 2 else 0
contig = contigs[ci]
cseq = seqmod.encode(contig["seq"])
print("contig", ci, len(cseq), "tiles:",
      [(t["node"], t["start"], t["end"], t["fwd"]) for t in contig["tiles"]])
aligns = per_contig[ci]
print("aligns:", len(aligns))
window, overlap, margin = 2000, 100, 150
n_win = (len(cseq) + window - 1) // window
for wi in range(n_win):
    w0, w1 = wi * window, min((wi + 1) * window, len(cseq))
    ext0, ext1 = max(w0 - overlap, 0), min(w1 + overlap, len(cseq))
    template = cseq[ext0:ext1]
    segs = []
    for ri, sign, chain in aligns:
        cs0 = min(a[2] for a in chain)
        ce1 = max(a[3] for a in chain)
        if cs0 > ext0 + 50 or ce1 < ext1 - 50:
            continue
        seg = _window_segment(read_codes[ri], sign, chain, ext0, ext1, margin)
        if seg is not None:
            segs.append(seg)
    print(f"win {wi} [{ext0},{ext1}) segs={len(segs)} "
          f"seg_lens={[len(s) for s in segs[:6]]} tpl={len(template)}")
    r = locate_and_align(template, hap1, W=512)
    r2 = locate_and_align(template, hap2, W=512)
    print(f"  template err hap1={r[0]/len(template) if r else None:.3f} "
          f"hap2={r2[0]/len(template) if r2 else None:.3f}")
    if segs:
        polished, _ = polish_until_converge(template, segs[:30], params,
                                            W=128, max_rounds=4)
        p1 = locate_and_align(polished, hap1, W=512)
        p2 = locate_and_align(polished, hap2, W=512)
        print(f"  polished len {len(polished)} err hap1="
              f"{p1[0]/len(polished) if p1 else None:.3f} hap2="
              f"{p2[0]/len(polished) if p2 else None:.3f}")
