"""Chunk selection: sample ~2 kbp windows, de-overlap, encode, polish.

Reference: ``haplotyper/src/determine_chunks.rs`` — weighted window sampling
(pick_random :229-253, window split :717-729), overlap removal via all-vs-all
mapping + greedy approx vertex cover (:255-355, :776-794), iterative
encode/filter/polish rounds (select_chunks :79-188), frequent-chunk removal
(:191-208), id compaction (:211-226), auto error threshold calc_sim_thr
(:806-823).

Round-1 subset (SURVEY.md §7.2 step 4): sampling + overlap removal + one
encode/polish round + frequent-chunk purge + compaction; the sparse-region /
tip filling iterations arrive with the quality loop.
"""

from __future__ import annotations

import logging

import numpy as np

from .. import seq as seqmod
from ..datamodel import Chunk, DataSet, ReadType
from ..mapper import ChunkIndex
from ..ops.phmm import PHMMParams
from ..ops.polish import polish_until_converge
from .encode import encode
from .util import update_coverage

logger = logging.getLogger(__name__)


def _windows(ds: DataSet, chunk_len: int, margin: int):
    """Split reads into candidate windows with repeat-aware weights
    (weight = fraction of unmasked (uppercase) bases)."""
    wins = []
    for r in ds.raw_reads:
        seq = r.seq
        n = (len(seq) - 2 * margin) // chunk_len
        for i in range(max(n, 0)):
            s = margin + i * chunk_len
            w = seq[s:s + chunk_len]
            upper_frac = sum(1 for c in w if c.isupper()) / max(len(w), 1)
            wins.append((w.upper(), upper_frac))
    return wins


def pick_random_windows(ds: DataSet, chunk_len: int, take_num: int,
                        margin: int, rng: np.random.Generator):
    wins = _windows(ds, chunk_len, margin)
    if not wins:
        return []
    weights = np.array([w for _, w in wins], float) + 1e-6
    weights /= weights.sum()
    k = min(take_num, len(wins))
    idx = rng.choice(len(wins), size=k, replace=False, p=weights)
    return [wins[i][0] for i in idx]


def remove_overlapping_chunks(seqs: list[str], k: int = 15,
                              min_hits: int = 10):
    """All-vs-all overlap detection + greedy approx vertex cover
    (determine_chunks.rs:310-355, :776-794)."""
    codes = {i: seqmod.encode(s) for i, s in enumerate(seqs)}
    index = ChunkIndex(codes, k=k)
    adj = {i: set() for i in range(len(seqs))}
    for i, c in codes.items():
        for cand in index.candidates(c, i, min_hits=min_hits, margin=100):
            if cand.chunk_id != i:
                adj[i].add(cand.chunk_id)
                adj[cand.chunk_id].add(i)
    removed = set()
    while True:
        deg = {i: len(adj[i] - removed) for i in adj if i not in removed}
        if not deg:
            break
        worst, d = max(deg.items(), key=lambda kv: kv[1])
        if d == 0:
            break
        removed.add(worst)
    return [s for i, s in enumerate(seqs) if i not in removed]


def remove_frequent_chunks(ds: DataSet, purge_copy_num: int):
    """determine_chunks.rs:191-208: drop chunks with pileup count far above
    coverage * (purge_copy_num + 3)."""
    cov = ds.coverage.unwrap() if ds.coverage.is_available else update_coverage(ds)
    counts: dict[int, int] = {}
    for er in ds.encoded_reads:
        for n in er.nodes:
            counts[n.chunk] = counts.get(n.chunk, 0) + 1
    thr = cov * (purge_copy_num + 3)
    drop = {c.id for c in ds.selected_chunks
            if counts.get(c.id, 0) > thr}
    if drop:
        purge_chunks(ds, drop)
    return drop


def purge_chunks(ds: DataSet, drop: set):
    """Remove chunks and strip their nodes from reads (lossless)."""
    ds.selected_chunks = [c for c in ds.selected_chunks if c.id not in drop]
    kept_reads = []
    for er in ds.encoded_reads:
        while True:
            bad = next((i for i, n in enumerate(er.nodes) if n.chunk in drop),
                       None)
            if bad is None:
                break
            er.remove(bad)
        if er.nodes:
            kept_reads.append(er)
    ds.encoded_reads = kept_reads


def compaction_chunks(ds: DataSet):
    """Renumber chunk ids to 0..n-1 (determine_chunks.rs:211-226)."""
    mapping = {}
    for new_id, c in enumerate(sorted(ds.selected_chunks, key=lambda c: c.id)):
        mapping[c.id] = new_id
        c.id = new_id
    ds.selected_chunks.sort(key=lambda c: c.id)
    for er in ds.encoded_reads:
        for n in er.nodes:
            n.chunk = mapping[n.chunk]
        for e in er.edges:
            e.from_ = mapping[e.from_]
            e.to = mapping[e.to]
    return mapping


def calc_sim_thr(ds: DataSet, quantile: float = 0.999) -> float:
    """99.9-percentile node error rate (determine_chunks.rs:806-823)."""
    chunks = {c.id: c.seq for c in ds.selected_chunks}
    errs = []
    for er in ds.encoded_reads:
        for n in er.nodes:
            mat, mism, ins, dele = n.aln_stats(chunks[n.chunk])
            aln = mat + mism + ins + dele
            if aln:
                errs.append((mism + ins + dele) / aln)
    if not errs:
        return ReadType.sim_thr(ds.read_type)
    return float(np.quantile(errs, quantile))


def polish_chunks(ds: DataSet, filter_size: int = 2, cap: int = 40,
                  seed: int = 42):
    """Per-chunk pileup consensus (polish_chunks.rs:36-90): polish each chunk
    against its pileup; drop chunks with pileup <= filter_size."""
    params = PHMMParams.from_hmmparam(ds.model_param.forward)
    pileups: dict[int, list] = {c.id: [] for c in ds.selected_chunks}
    for er in ds.encoded_reads:
        for n in er.nodes:
            if n.chunk in pileups:
                pileups[n.chunk].append(seqmod.encode(n.seq))
    rng = np.random.default_rng(seed)
    drop = set()
    for c in ds.selected_chunks:
        pu = pileups[c.id]
        if len(pu) <= filter_size:
            drop.add(c.id)
            continue
        sel = [pu[i] for i in rng.permutation(len(pu))[:cap]]
        band = max(ReadType.band_width(ds.read_type, len(c.seq)), 64)
        band = ((band + 63) // 64) * 64
        polished, _ = polish_until_converge(c.codes(), sel, params, W=band,
                                            max_rounds=6)
        c.seq = seqmod.decode(polished).decode()
    if drop:
        purge_chunks(ds, drop)
    return drop


def select_chunks(ds: DataSet, chunk_len: int = 2000, take_num: int = 500,
                  margin: int = 500, seed: int = 42, purge_copy_num: int = 10,
                  encode_kwargs: dict | None = None) -> DataSet:
    rng = np.random.default_rng(seed)
    encode_kwargs = encode_kwargs or {}
    seqs = pick_random_windows(ds, chunk_len, take_num, margin, rng)
    seqs = remove_overlapping_chunks(seqs)
    ds.selected_chunks = [Chunk(i, s, 1, 2) for i, s in enumerate(seqs)]
    logger.info("select_chunks: %d windows after overlap removal", len(seqs))
    # round 1: relaxed encode + coverage + frequent-chunk purge + polish
    relaxed = 2 * ReadType.sim_thr(ds.read_type)
    encode(ds, sim_thr=relaxed, **encode_kwargs)
    update_coverage(ds)
    remove_frequent_chunks(ds, purge_copy_num)
    polish_chunks(ds)
    compaction_chunks(ds)
    # final: re-encode against polished chunks with calibrated threshold
    encode(ds, sim_thr=None, **encode_kwargs)
    thr = calc_sim_thr(ds)
    logger.info("select_chunks: calibrated sim_thr=%.3f", thr)
    encode(ds, sim_thr=thr, **encode_kwargs)
    update_coverage(ds)
    ds.push_stage("DetermineChunks", [f"take_num={take_num}"])
    return ds
