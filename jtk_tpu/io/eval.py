"""Truth-based evaluation helpers (compare_haplotypes counterpart).

Reference: ``sandbox/src/bin/compare_haplotypes.rs`` + ``script/see_metric.sh``
— align assembled contigs to truth haplotypes and report identity/coverage.
"""

from __future__ import annotations

import numpy as np

from .. import seq as seqmod
from ..mapper import ChunkIndex
from ..ops.banded_align import diagonal_offsets, banded_align_batch


def locate_and_align(query: np.ndarray, ref: np.ndarray, W: int = 512,
                     k: int = 15):
    """Find the best placement of ``query`` (either strand) in ``ref`` via
    k-mer diagonal voting, then banded infix alignment.

    Returns (edit_dist, strand, ref_span) or None if no seed found."""
    index = ChunkIndex({0: query}, k=k, max_occ=256)
    best = None
    for strand, rseq in ((1, ref), (-1, seqmod.revcomp(ref))):
        cands = index.candidates_one_strand(rseq, 0, True, min_hits=3,
                                            margin=0, stride=1)
        # candidates place query in rseq coords: diag = rseq_pos - query_pos
        for c in cands:
            diag = c.window_start  # margin=0 -> window_start == diag estimate
            Q = ((len(query) + 63) // 64) * 64
            off = diagonal_offsets(len(query), diag, len(rseq), Q, W)
            qp = np.full(Q, 4, np.int8)
            qp[:len(query)] = query
            res = banded_align_batch(qp[None], rseq[None].astype(np.int8),
                                     off[None], np.array([len(query)]),
                                     np.array([len(rseq)]), W, "infix")
            d = int(res["score"][0])
            if best is None or d < best[0]:
                best = (d, strand, int(res["end_j"][0]))
    return best


def contig_error_rate(contig_seq: str, haplotypes: list[np.ndarray],
                      W: int = 512) -> float:
    """Min edit-distance fraction of the contig against any haplotype."""
    cseq = seqmod.encode(contig_seq)
    best = np.inf
    for hap in haplotypes:
        r = locate_and_align(cseq, np.asarray(hap, np.int8), W=W)
        if r is not None:
            best = min(best, r[0] / max(len(cseq), 1))
    return float(best)


def assembly_metrics(gfa_text: str, haplotypes, min_len: int = 300,
                     W: int = 512):
    """Per-contig error rates + haplotype coverage summary."""
    from .gfa import parse_gfa
    segs, _ = parse_gfa(gfa_text)
    out = {}
    total, err_sum = 0, 0.0
    for name, rec in segs.items():
        if len(rec["seq"]) < min_len:
            continue
        e = contig_error_rate(rec["seq"], haplotypes, W=W)
        out[name] = {"len": len(rec["seq"]), "error": e}
        if np.isfinite(e):
            total += len(rec["seq"])
            err_sum += e * len(rec["seq"])
    mean_err = err_sum / total if total else float("nan")
    return {"contigs": out, "total_len": total, "mean_error": mean_err}
