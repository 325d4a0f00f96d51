"""GFA summary: per-copy-number contig stats + optional truth comparison.

Dev-harness parity with the reference's ``script/see_metric.sh`` +
``summaries_gfa.awk`` + ``sandbox/src/bin/compare_haplotypes.rs``
(SURVEY.md §2.6): lengths / N50 grouped by the cp:i tag, and per-contig
identity against truth haplotypes (.npy code arrays or FASTA).

Usage: python scripts/summarize_gfa.py out.gfa [hap1.npy hap2.npy ...]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def n50(lengths):
    ls = sorted(lengths, reverse=True)
    half = sum(ls) / 2
    acc = 0
    for x in ls:
        acc += x
        if acc >= half:
            return x
    return 0


def load_truth(path):
    if path.endswith(".npy"):
        return np.load(path)
    from jtk_tpu import seq as seqmod
    seqs = []
    cur = []
    for line in open(path):
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
            cur = []
        else:
            cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    return seqmod.encode("".join(seqs))


def main():
    gfa_path = sys.argv[1]
    truth = [load_truth(p) for p in sys.argv[2:]]
    segs = {}          # name -> (len, cp, seq)
    for line in open(gfa_path):
        f = line.rstrip("\n").split("\t")
        if f[0] != "S":
            continue
        name, seq = f[1], f[2]
        cp = None
        for tag in f[3:]:
            if tag.startswith("cp:i:"):
                cp = int(tag[5:])
        segs[name] = (len(seq), cp, seq)

    by_cp = {}
    for name, (ln, cp, _s) in segs.items():
        by_cp.setdefault(cp, []).append(ln)
    print("cp\tn_contigs\ttotal_bp\tN50\tmax")
    for cp in sorted(by_cp, key=lambda x: (x is None, x)):
        ls = by_cp[cp]
        print(f"{cp}\t{len(ls)}\t{sum(ls)}\t{n50(ls)}\t{max(ls)}")
    total = [ln for ln, _c, _s in segs.values()]
    print(f"ALL\t{len(total)}\t{sum(total)}\t{n50(total)}\t"
          f"{max(total) if total else 0}")

    if truth:
        from jtk_tpu.io.eval import assembly_metrics
        m = assembly_metrics(open(gfa_path).read(), truth)
        print("\ncontig\tlen\terror_vs_best_hap")
        for name, rec in m["contigs"].items():
            print(f"{name}\t{rec['len']}\t{rec['error']:.5f}")
        print(f"TOTAL\t{m['total_len']}\tmean_error={m['mean_error']:.5f}")


if __name__ == "__main__":
    main()
