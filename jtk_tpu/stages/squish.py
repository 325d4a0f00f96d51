"""Squish erroneous clusterings that are inconsistent with their neighbors.

Reference: ``haplotyper/src/squish_erroneous_clusters.rs`` — pairwise adjusted
Rand index between co-occurring clustered chunks computed on posterior-biased
nodes only (check_correl :213-252), a greedy/MCMC partition of chunks into
"stiff" (phasing-consistent) vs not (classify_nodes :281-365, score =
count * {match_score, mismatch_score} around the ARI threshold), and chunks
inconsistent with the stiff set are squished to one cluster (:44-60).
"""

from __future__ import annotations

import logging
from collections import defaultdict

from ..datamodel import DataSet
from .util import adjusted_rand_index

logger = logging.getLogger(__name__)


def _biased_pairs(ds: DataSet, count: int):
    """Chunk-pair -> (ari, n_shared) over reads where both nodes are biased."""
    per_read = []
    for er in ds.encoded_reads:
        nodes = [(n.chunk, n.cluster) for n in er.nodes
                 if n.is_biased(0.2)]
        per_read.append(nodes)
    shared = defaultdict(list)
    for nodes in per_read:
        seen = {}
        for c, cl in nodes:
            seen.setdefault(c, cl)
        cs = sorted(seen)
        for i in range(len(cs)):
            for j in range(i + 1, len(cs)):
                shared[(cs[i], cs[j])].append((seen[cs[i]], seen[cs[j]]))
    pairs = {}
    for key, obs in shared.items():
        if len(obs) < count:
            continue
        a = [x for x, _ in obs]
        b = [y for _, y in obs]
        pairs[key] = (adjusted_rand_index(a, b), len(obs))
    return pairs


def squish_erroneous_clusters(ds: DataSet, ari: float = 0.4,
                              match_score: float = 4.0,
                              mismatch_score: float = -1.0,
                              count: int = 7) -> DataSet:
    clustered = {c.id for c in ds.selected_chunks if c.cluster_num > 1}
    pairs = {k: v for k, v in _biased_pairs(ds, count).items()
             if k[0] in clustered and k[1] in clustered}
    if not pairs:
        ds.push_stage("SquishErroneousClusters", [])
        return ds
    # greedy stiff/non-stiff partition: a chunk is stiff if its agreement with
    # other stiff chunks is net-positive
    adj = defaultdict(list)
    for (a, b), (r, n) in pairs.items():
        w = n * (match_score if r >= ari else mismatch_score)
        adj[a].append((b, w))
        adj[b].append((a, w))
    stiff = {c: True for c in clustered}
    for _ in range(20):
        changed = False
        for c in clustered:
            gain = sum(w for o, w in adj[c] if stiff.get(o, False))
            want = gain >= 0
            if stiff[c] != want:
                stiff[c] = want
                changed = True
        if not changed:
            break
    # squish chunks that are not stiff but interact with stiff chunks
    chunks = {c.id: c for c in ds.selected_chunks}
    squished = set()
    for c in clustered:
        if stiff[c]:
            continue
        if any(stiff.get(o, False) for o, _ in adj[c]):
            squished.add(c)
    for cid in squished:
        chunks[cid].cluster_num = 1
        chunks[cid].score = 0.0
    for er in ds.encoded_reads:
        for n in er.nodes:
            if n.chunk in squished:
                n.cluster = 0
                n.posterior = [0.0]
    logger.info("squish: %d/%d clustered chunks squished", len(squished),
                len(clustered))
    ds.push_stage("SquishErroneousClusters", [f"ari={ari}"])
    return ds
