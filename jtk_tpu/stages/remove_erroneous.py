"""Remove erroneous nodes — occurrences supported only by weak edges.

Reference: ``haplotyper/src/remove_erroneous_nodes.rs:33-156`` — computes
calibrated edge coverages, finds edges below median/4 whose neighborhood
offers a >=3x better-supported alternative, and removes the offending node
occurrences from reads (keeping losslessness via EncodedRead.remove).
"""

from __future__ import annotations

import logging
from collections import defaultdict

import numpy as np

from ..datamodel import DataSet

logger = logging.getLogger(__name__)


def remove_erroneous_nodes(ds: DataSet, weak_frac: float = 0.25,
                           alt_factor: float = 3.0) -> DataSet:
    # edge occurrence counts in chunk space (undirected, strand-canonical)
    edge_occ = defaultdict(int)
    for er in ds.encoded_reads:
        for a, b in zip(er.nodes, er.nodes[1:]):
            k1 = (a.chunk, a.is_forward)
            k2 = (b.chunk, b.is_forward)
            key = (k1, k2) if k1 <= k2 else ((b.chunk, not b.is_forward),
                                             (a.chunk, not a.is_forward))
            edge_occ[key] += 1
    if not edge_occ:
        ds.push_stage("RemoveErroneousNodes", [])
        return ds
    med = float(np.median(list(edge_occ.values())))
    thr = med * weak_frac

    def key_of(a, b):
        k1 = (a.chunk, a.is_forward)
        k2 = (b.chunk, b.is_forward)
        return (k1, k2) if k1 <= k2 else ((b.chunk, not b.is_forward),
                                          (a.chunk, not a.is_forward))

    # per (chunk, strand-exit): strongest outgoing edge occurrence
    best_out = defaultdict(int)
    for ((c1, d1), (c2, d2)), occ in edge_occ.items():
        best_out[(c1, d1)] = max(best_out[(c1, d1)], occ)
        best_out[(c2, not d2)] = max(best_out[(c2, not d2)], occ)

    removed = 0
    for er in ds.encoded_reads:
        i = 0
        while i < len(er.nodes):
            n = er.nodes[i]
            # a node is erroneous if every edge it participates in is weak
            # while its neighbors have a much better alternative
            weak = []
            for j in (i - 1, i + 1):
                if 0 <= j < len(er.nodes):
                    a, b = (er.nodes[j], n) if j < i else (n, er.nodes[j])
                    occ = edge_occ.get(key_of(a, b), 0)
                    nb = er.nodes[j]
                    alt = best_out[(nb.chunk, nb.is_forward if j < i
                                    else not nb.is_forward)]
                    weak.append(occ < thr and alt >= alt_factor * max(occ, 1))
            if weak and all(weak):
                er.remove(i)
                removed += 1
                continue
            i += 1
    ds.encoded_reads = [er for er in ds.encoded_reads if er.nodes]
    logger.info("remove_erroneous_nodes: removed %d node occurrences", removed)
    ds.push_stage("RemoveErroneousNodes", [])
    return ds
