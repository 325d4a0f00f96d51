"""Clustering correction — global phasing smoothing by spectral clustering.

Reference: ``haplotyper/src/phmm_likelihood_correction.rs`` — per chunk, every
covering read becomes a context of ordered neighbor (chunk, posterior) arms
(to_context :242-261); pairwise read similarity aligns the chunk-symbol
strings with a match score equal to the log-odds that both reads draw the same
cluster from their posteriors (sim/align :466-550), sigmoid-squashed and
kNN-sparsified (:330-347); the normalized graph Laplacian's eigenvalue count
below 0.2 picks k, the spectral embedding (+ appended posteriors) is k-means
clustered with 20 restarts (:263-328, :405-464), per-chunk ARI against the
previous labels decides squishing of the bottom quantile (:31-129), and hard
posteriors (0 / -10000) are written back.

numpy implementation: the matrices are coverage-sized (<= a few hundred), so
``np.linalg.eigh`` is ample (SURVEY.md §2.4 nalgebra note).
"""

from __future__ import annotations

import logging
from collections import defaultdict

import numpy as np

from ..datamodel import DataSet
from .util import adjusted_rand_index, logsumexp

logger = logging.getLogger(__name__)

ARM_LEN = 5
EIG_THR = 0.2
HARD_NEG = -10000.0


def _context(er, idx):
    """(center node, up-arm, down-arm) of the idx-th node; arms are lists of
    (chunk, posterior np.array) ordered away from the center, oriented in the
    center node's frame."""
    n = er.nodes[idx]
    after = [(m.chunk, np.array(m.posterior)) for m in er.nodes[idx + 1:]]
    before = [(m.chunk, np.array(m.posterior)) for m in er.nodes[:idx]][::-1]
    if n.is_forward:
        up, down = before, after
    else:
        up, down = after, before
    return n, up[:ARM_LEN], down[:ARM_LEN]


def _post_sim(p: np.ndarray, q: np.ndarray) -> float:
    """Log-odds that two posterior draws agree vs independent uniform."""
    if len(p) != len(q) or len(p) == 0:
        return 0.0
    k = len(p)
    agree = float(logsumexp(p + q))
    return agree + float(np.log(k))


def _arm_sim(a, b) -> float:
    s = 0.0
    for (ca, pa), (cb, pb) in zip(a, b):
        if ca == cb:
            s += _post_sim(pa, pb)
        else:
            break  # arms diverge (different path) — stop accumulating
    return s


def correct_clustering(ds: DataSet, repeat_num: int = 5,
                       coverage_thr: int = 5, knn: int = 8,
                       squish_quantile: float = 0.05,
                       seed: int = 42) -> DataSet:
    rng = np.random.default_rng(seed)
    chunks = {c.id: c for c in ds.selected_chunks}
    occurrences = defaultdict(list)  # chunk -> [(read_idx, node_idx)]
    for ri, er in enumerate(ds.encoded_reads):
        for ni, n in enumerate(er.nodes):
            occurrences[n.chunk].append((ri, ni))
    aris = {}
    new_assignments = {}
    for cid, occ in occurrences.items():
        chunk = chunks.get(cid)
        if chunk is None or len(occ) < coverage_thr:
            continue
        if chunk.cluster_num <= 1:
            continue
        R = len(occ)
        ctxs = [_context(ds.encoded_reads[ri], ni) for ri, ni in occ]
        # similarity matrix
        A = np.zeros((R, R))
        for i in range(R):
            for j in range(i + 1, R):
                s = (_post_sim(np.array(ctxs[i][0].posterior),
                               np.array(ctxs[j][0].posterior))
                     + _arm_sim(ctxs[i][1], ctxs[j][1])
                     + _arm_sim(ctxs[i][2], ctxs[j][2]))
                A[i, j] = A[j, i] = 1.0 / (1.0 + np.exp(-s))
        # kNN sparsify (keep strongest k per row, symmetrize)
        if R > knn + 1:
            keep = np.zeros_like(A, bool)
            for i in range(R):
                top = np.argsort(-A[i])[:knn]
                keep[i, top] = True
            A = np.where(keep | keep.T, A, 0.0)
        d = A.sum(1) + 1e-9
        Dm = 1.0 / np.sqrt(d)
        L = np.eye(R) - Dm[:, None] * A * Dm[None, :]
        evals, evecs = np.linalg.eigh(L)
        k = int(np.clip(np.sum(evals < EIG_THR), 1, chunk.copy_num))
        if k <= 1:
            asn = np.zeros(R, np.int64)
        else:
            emb = evecs[:, :k]
            post = np.array([np.exp(c[0].posterior) for c in ctxs])
            if post.shape[1] > 0:
                emb = np.concatenate([emb, post], axis=1)
            # the reference normalizes COLUMNS (normalize_columns,
            # phmm_likelihood_correction.rs:299) — not NJW row normalization —
            # so the appended posterior features get equal scale to the
            # eigenvector features; verified better on the minority-flip test
            emb = emb / (np.linalg.norm(emb, axis=0, keepdims=True) + 1e-9)
            asn = _kmeans_multi(emb, k, rng, restarts=20)
        old = np.array([ds.encoded_reads[ri].nodes[ni].cluster
                        for ri, ni in occ])
        aris[cid] = adjusted_rand_index(old, asn)
        new_assignments[cid] = (asn, k)
    if not new_assignments:
        ds.push_stage("ClusteringCorrection", [])
        return ds
    # squish low-agreement chunks unless protected by a high clustering score
    ari_vals = sorted(aris.values())
    cutoff = min(ari_vals[max(int(len(ari_vals) * squish_quantile) - 1, 0)]
                 if ari_vals else -1.0, 0.5)
    scores = [chunks[c].score for c in aris]
    protect_score = np.quantile(scores, 0.5) if scores else 0.0
    for cid, (asn, k) in new_assignments.items():
        chunk = chunks[cid]
        if aris[cid] < cutoff and chunk.score < protect_score:
            chunk.cluster_num = 1
            for ri, ni in occurrences[cid]:
                node = ds.encoded_reads[ri].nodes[ni]
                node.cluster = 0
                node.posterior = [0.0]
            continue
        chunk.cluster_num = int(k)
        for (ri, ni), a in zip(occurrences[cid], asn):
            node = ds.encoded_reads[ri].nodes[ni]
            node.cluster = int(a)
            node.posterior = [0.0 if c == a else HARD_NEG for c in range(k)]
    logger.info("correct_clustering: %d chunks corrected, mean ARI %.3f",
                len(new_assignments), float(np.mean(list(aris.values()))))
    ds.push_stage("ClusteringCorrection", [])
    return ds


def _kmeans_multi(X, k, rng, restarts=20, iters=30):
    best, best_obj = None, np.inf
    R = len(X)
    for _ in range(restarts):
        centers = X[rng.choice(R, size=k, replace=False)]
        for _ in range(iters):
            d = ((X[:, None] - centers[None]) ** 2).sum(-1)
            asn = d.argmin(1)
            for c in range(k):
                m = asn == c
                if m.any():
                    centers[c] = X[m].mean(0)
        obj = ((X - centers[asn]) ** 2).sum()
        if obj < best_obj:
            best, best_obj = asn.copy(), obj
    return best
