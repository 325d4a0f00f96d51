"""Deletion fill — recover chunk occurrences that encoding missed.

Reference: ``haplotyper/src/encode/deletion_fill.rs`` — aligns other reads'
chunk strings to each read to vote for missing (chunk, cluster) insertions
(chunk-space Gotoh DP :738-827, pileup voting :642-698), then re-encodes the
candidates at bp resolution (edlib infix + guided refinement :451-592),
accepting when the alignment error is below expected(read) + expected(chunk)
+ 10 sigma (:369); iterates with memoization (:136-214).

TPU-native structure: candidate discovery uses adjacency evidence from the
read set (host, vectorized dicts); every candidate is verified by ONE batched
K3 infix alignment on device (the accept criterion mirrors the reference's
error model from the ALS fit).  Optional ``re_cluster`` re-runs local
clustering on chunks whose pileups changed (deletion_fill.rs:35-91).
"""

from __future__ import annotations

import logging
from collections import defaultdict

import numpy as np

from .. import seq as seqmod
from ..datamodel import DataSet
from ..mapper import Candidate, extend_candidates
from .encode import _dedup_nodes, _node_from_result, nodes_to_encoded_read
from .error_rate import estimate_error_rate

logger = logging.getLogger(__name__)

SIGMA_FACTOR = 10.0


def _walk(er):
    """Ordered (chunk, dir, start, end) tuples of a read."""
    out = []
    for n in er.nodes:
        out.append((n.chunk, n.is_forward, n.position_from_start,
                    n.position_from_start + n.query_length()))
    return out


def _adjacency_evidence(ds: DataSet):
    """(A, dirA) -> list of (Z, dirZ, offset from A end to Z start).

    Both orientations of every observed adjacency are recorded."""
    ev = defaultdict(list)
    for er in ds.encoded_reads:
        walk = _walk(er)
        for (a, da, sa, ea), (z, dz, sz, ez) in zip(walk, walk[1:]):
            ev[(a, da)].append((z, dz, sz - ea))
            ev[(z, not dz)].append((a, not da, sz - ea))
    return ev


def _median_offsets(ev):
    out = {}
    for key, triples in ev.items():
        per_succ = defaultdict(list)
        for z, dz, off in triples:
            per_succ[(z, dz)].append(off)
        out[key] = {zk: (int(np.median(offs)), len(offs))
                    for zk, offs in per_succ.items()}
    return out


def correct_deletion(ds: DataSet, re_cluster: bool = False,
                     rounds: int = 2, margin: int = 100,
                     min_evidence: int = 2, W: int = 256) -> DataSet:
    chunk_seqs = {c.id: c.codes() for c in ds.selected_chunks}
    cluster_num = {c.id: c.cluster_num for c in ds.selected_chunks}
    erm = estimate_error_rate(ds)
    changed_chunks: set = set()
    for rnd in range(rounds):
        ev = _median_offsets(_adjacency_evidence(ds))
        read_codes = []
        read_ascii = []
        cands = []
        cand_meta = []  # (read_idx_in_list, expected cluster info)
        for idx, er in enumerate(ds.encoded_reads):
            ascii_seq = er.recover_raw_read()
            read_ascii.append(ascii_seq)
            codes = seqmod.encode(ascii_seq)
            read_codes.append(codes)
            walk = _walk(er)
            present = {(c, s) for c, _d, s, _e in
                       [(w[0], w[1], w[2], w[3]) for w in walk]}
            existing_spans = [(s, e) for _c, _d, s, e in walk]

            def overlaps_existing(lo, hi):
                return any(not (hi <= s or e <= lo) for s, e in existing_spans)

            proposals = {}
            # between / after each node
            for (a, da, sa, ea) in walk:
                for (z, dz), (off, cnt) in ev.get((a, da), {}).items():
                    if cnt < min_evidence or z not in chunk_seqs:
                        continue
                    zlen = len(chunk_seqs[z])
                    pos = ea + off
                    if pos < -zlen or pos > len(codes):
                        continue
                    if overlaps_existing(pos + zlen // 4, pos + 3 * zlen // 4):
                        continue
                    proposals[(z, dz, pos // 64)] = (z, dz, pos)
            # before each node (predecessor evidence, reversed key)
            for (a, da, sa, ea) in walk:
                for (z, dz), (off, cnt) in ev.get((a, not da), {}).items():
                    if cnt < min_evidence or z not in chunk_seqs:
                        continue
                    zlen = len(chunk_seqs[z])
                    # evidence is (a rev) -> (z rev): z precedes a
                    pos = sa - off - zlen
                    if pos < -zlen or pos > len(codes):
                        continue
                    if overlaps_existing(pos + zlen // 4, pos + 3 * zlen // 4):
                        continue
                    proposals[(z, not dz, pos // 64)] = (z, not dz, pos)
            for z, dz, pos in proposals.values():
                zlen = len(chunk_seqs[z])
                if dz:
                    wstart = pos - margin
                else:
                    # strand coords: reverse-complement frame
                    wstart = len(codes) - (pos + zlen) - margin
                cands.append(Candidate(idx, z, dz, wstart,
                                       zlen + 2 * margin, 0))
        if not cands:
            break
        results = extend_candidates(cands, read_codes, chunk_seqs, W=W,
                                    margin=margin)
        added = 0
        touched = set()
        for res in results:
            c = res["cand"]
            clen = len(chunk_seqs[c.chunk_id])
            aln_len = max(res["span_end"] - res["span_start"], 1)
            err = res["dist"] / max(aln_len, clen)
            er_read = ds.encoded_reads[c.read_idx]
            thr = (erm.read_of(er_read.id) + erm.chunk_of(c.chunk_id, 0)
                   + SIGMA_FACTOR * max(erm.median_abs_dev, 0.005))
            if err > thr:
                continue
            n = _node_from_result(res, read_codes, read_ascii)
            if n is None:
                continue
            touched.add(c.read_idx)
            er_read._pending = getattr(er_read, "_pending", [])
            er_read._pending.append(n)
            added += 1
        if added == 0:
            break
        for idx in touched:
            er = ds.encoded_reads[idx]
            pending = er._pending
            del er._pending
            nodes = [{
                "chunk": n.chunk, "is_forward": n.is_forward,
                "start": n.position_from_start,
                "end": n.position_from_start + n.query_length(),
                "seq": n.seq, "cigar": n.cigar, "dist": 0,
            } for n in er.nodes]
            nodes.extend(pending)
            merged = _dedup_nodes(nodes)
            new_er = nodes_to_encoded_read(er.id, read_ascii[idx], merged,
                                           cluster_num)
            if new_er is not None:
                # preserve cluster assignments/posteriors of surviving nodes
                orig = {(n.chunk, n.position_from_start, n.is_forward): n
                        for n in er.nodes}
                for n in new_er.nodes:
                    o = orig.get((n.chunk, n.position_from_start, n.is_forward))
                    if o is not None:
                        n.cluster = o.cluster
                        n.posterior = o.posterior
                er.leading_gap = new_er.leading_gap
                er.trailing_gap = new_er.trailing_gap
                er.nodes = new_er.nodes
                er.edges = new_er.edges
                changed_chunks.update(n["chunk"] for n in pending)
        logger.info("correct_deletion round %d: %d insertions", rnd, added)
    if re_cluster and changed_chunks:
        from .local_clustering import local_clustering
        from .multiplicity import estimate_multiplicity
        estimate_multiplicity(ds)
        local_clustering(ds, selection=changed_chunks)
    ds.push_stage("CorrectDeletion", [f"re_cluster={re_cluster}"])
    return ds
