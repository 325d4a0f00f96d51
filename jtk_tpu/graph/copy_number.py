"""Copy-number assignment on the ditch graph.

Reference: ``haplotyper/src/copy_number_estimation/copy_number_flow.rs`` — the
production algorithm (COPYNUM_ALGORITHM=4): integer copy numbers minimizing
sum (cov - cp*hap_cov)^2 under flow consistency (a node's copy number equals
the sum of edge copies at each connected plug), optimized by repeated
negative-cost residual moves.

Same objective here, optimized by coordinate-descent +-1 moves on nodes and
edges with an annealed consistency penalty that ends effectively hard, using
O(1) incremental deltas.  Graphs are ~10^3 elements; host numpy is ample
(SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np

from .ditch_graph import HEAD, TAIL, DitchGraph


def assign_copy_numbers(g: DitchGraph, hap_cov: float,
                        rounds: int = 12) -> None:
    nodes = list(g.nodes.keys())
    edges = list(g.edges.keys())
    nidx = {n: i for i, n in enumerate(nodes)}
    eidx = {k: i for i, k in enumerate(edges)}
    N, E = len(nodes), len(edges)
    if N == 0:
        return
    hc = max(hap_cov, 1e-3)
    node_cov = np.array([g.nodes[n].occ for n in nodes], float)
    edge_cov = np.array([g.edges[k].occ for k in edges], float)
    cp_n = np.maximum(np.round(node_cov / hc), 0).astype(np.int64)
    cp_e = np.maximum(np.round(edge_cov / hc), 0).astype(np.int64)

    # plugs: only (node, plug) sides that have edges participate in consistency
    plug_node = []          # plug -> node index
    node_plugs = [[] for _ in range(N)]
    edge_plugs = [[] for _ in range(E)]
    for n in nodes:
        for plug in (HEAD, TAIL):
            eks = [eidx[k] for k in g._adj[(n, plug)] if k in eidx]
            if not eks:
                continue
            pi = len(plug_node)
            plug_node.append(nidx[n])
            node_plugs[nidx[n]].append(pi)
            for e in eks:
                edge_plugs[e].append(pi)
    P = len(plug_node)
    # diff[p] = cp_node - sum of incident edge copies
    diff = np.zeros(P, np.int64)
    for p in range(P):
        diff[p] = cp_n[plug_node[p]]
    for e in range(E):
        for p in edge_plugs[e]:
            diff[p] -= cp_e[e]

    def node_delta(i, d, lam):
        dd = (node_cov[i] - (cp_n[i] + d) * hc) ** 2 \
            - (node_cov[i] - cp_n[i] * hc) ** 2
        for p in node_plugs[i]:
            dd += lam * ((diff[p] + d) ** 2 - diff[p] ** 2)
        return dd

    def edge_delta(j, d, lam):
        dd = (edge_cov[j] - (cp_e[j] + d) * hc) ** 2 \
            - (edge_cov[j] - cp_e[j] * hc) ** 2
        for p in edge_plugs[j]:
            dd += lam * ((diff[p] - d) ** 2 - diff[p] ** 2)
        return dd

    lams = np.geomspace(0.1 * hc * hc, 20 * hc * hc, rounds)
    for lam in lams:
        for _ in range(50):  # sweeps until stable at this lambda
            improved = False
            for i in range(N):
                for d in (-1, 1):
                    if cp_n[i] + d < 0:
                        continue
                    if node_delta(i, d, lam) < -1e-9:
                        cp_n[i] += d
                        for p in node_plugs[i]:
                            diff[p] += d
                        improved = True
                        break
            for j in range(E):
                for d in (-1, 1):
                    if cp_e[j] + d < 0:
                        continue
                    if edge_delta(j, d, lam) < -1e-9:
                        cp_e[j] += d
                        for p in edge_plugs[j]:
                            diff[p] -= d
                        improved = True
                        break
            if not improved:
                break
    for n, i in nidx.items():
        g.nodes[n].copy_num = int(cp_n[i])
    for k, i in eidx.items():
        g.edges[k].copy_num = int(cp_e[i])
