"""Repeat resolution by foci — duplicate multi-copy nodes along spanning reads.

Reference: ``haplotyper/src/assemble/ditch_graph/repeat_resolve_by_focus.rs``
— for each copy-1 node flowing into a branching / multi-copy region, count the
reads reaching each candidate copy-1 node (traverse/count_dist_nodes
:561-673); a likelihood-ratio test between a concentrated "true successor"
distribution (1-ERROR_PROB) and the uniform null over siblings yields a Focus
(get_foci :286-341); the best focus triggers ``duplicate_along``: clone the
multi-copy nodes along the read-supported path with copy 1, decrement the
originals, and rewire edges (:90-236).

Cloned nodes get keys (chunk, cluster, dup_id); downstream consumers treat
key[:2] as the (chunk, cluster) identity.
"""

from __future__ import annotations

import logging
import math
from collections import Counter, defaultdict

from .ditch_graph import HEAD, TAIL, DEdge, DitchGraph, DNode

logger = logging.getLogger(__name__)

ERROR_PROB = 0.1
MAX_DIST = 8


def read_walks(encoded_reads):
    """Each read as [(node_key, is_forward)] (graph node keys)."""
    walks = []
    for er in encoded_reads:
        walks.append([((n.chunk, n.cluster), n.is_forward)
                      for n in er.nodes])
    return walks


def _copy(g, key):
    n = g.nodes.get(key)
    return (n.copy_num if n and n.copy_num is not None else 1)


def find_foci(g: DitchGraph, walks, min_span: int = 2, llr_thr: float = 1.0):
    """Return list of (llr, focus_key, focus_dir, target_key, path, support)
    where path is the intermediate node/dir list from read evidence."""
    # index: node_key -> [(walk_idx, pos, dir)]
    occ = defaultdict(list)
    for wi, walk in enumerate(walks):
        for pos, (key, d) in enumerate(walk):
            occ[key].append((wi, pos, d))
    foci = []
    for key, node in g.nodes.items():
        if _copy(g, key) != 1:
            continue
        for fwd_dir in (True, False):
            # reads traversing `key` in direction fwd_dir continue "rightward"
            cont = defaultdict(list)  # target -> [(dist, wi, pos)]
            for wi, pos, d in occ[key]:
                walk = walks[wi]
                if d == fwd_dir:
                    after = walk[pos + 1: pos + 1 + MAX_DIST]
                else:
                    after = [(k, not dd) for k, dd in
                             walk[max(pos - MAX_DIST, 0):pos][::-1]]
                for dist, (tkey, td) in enumerate(after):
                    if tkey in g.nodes and _copy(g, tkey) == 1 and dist > 0:
                        cont[(tkey, td)].append((dist, wi, pos))
                        break  # first copy-1 node reached
            if not cont:
                continue
            total = sum(len(v) for v in cont.values())
            if total < min_span:
                continue
            (best_t, best_d), best_obs = max(cont.items(),
                                             key=lambda kv: len(kv[1]))
            k_alt = max(len(cont), 2)
            n_best = len(best_obs)
            # LLR: concentrated (1-e) vs uniform over alternatives
            p1 = max(1.0 - ERROR_PROB, 1e-3)
            p0 = 1.0 / k_alt
            llr = n_best * math.log(p1 / p0) + \
                (total - n_best) * math.log(max(ERROR_PROB / (1 - p0), 1e-3))
            if llr < llr_thr or n_best < min_span:
                continue
            # read-supported intermediate path (most common)
            paths = Counter()
            for dist, wi, pos in best_obs:
                walk = walks[wi]
                _, _, d = next(o for o in occ[key] if o[0] == wi and o[1] == pos)
                if d == fwd_dir:
                    mid = tuple(walk[pos + 1: pos + 1 + dist])
                else:
                    mid = tuple((k2, not d2) for k2, d2 in
                                walk[pos - dist:pos][::-1])
                paths[mid] += 1
            path, _cnt = paths.most_common(1)[0]
            # only resolve through multi-copy intermediates
            if not path or not all(_copy(g, k2) >= 2 for k2, _ in path):
                continue
            foci.append((llr, key, fwd_dir, (best_t, best_d), list(path),
                         n_best))
    foci.sort(key=lambda f: -f[0])
    return foci


def duplicate_along(g: DitchGraph, focus_key, focus_dir, target, path,
                    support, dup_counter):
    """Clone the multi-copy path nodes, rewire focus -> clones -> target."""
    tkey, tdir = target

    def exit_plug(d):
        return TAIL if d else HEAD

    def entry_plug(d):
        return HEAD if d else TAIL

    def find_edge(k1, d1, k2, d2):
        for e in g.edges_at(k1, exit_plug(d1)):
            on, op = g.other_end(e, k1, exit_plug(d1))
            if on == k2 and op == entry_plug(d2):
                return e
        return None

    prev_key, prev_dir = focus_key, focus_dir
    orig_prev = (focus_key, focus_dir)
    for (mk, md) in path:
        orig = g.nodes[mk]
        dup_counter[mk] = dup_counter.get(mk, 0) + 1
        clone_key = (mk[0], mk[1], dup_counter[mk])
        g.nodes[clone_key] = DNode(clone_key, orig.seq, occ=support,
                                   copy_num=1)
        # reduce the original's copy number and occupancy
        if orig.copy_num is not None and orig.copy_num > 0:
            orig.copy_num -= 1
        orig.occ = max(orig.occ - support, 0)
        # edge from prev to clone, labels from the original edge
        oe = find_edge(*orig_prev, mk, md)
        off = oe.offset() if oe else 0
        lab = oe.label() if oe else ""
        if oe is not None and (oe.from_node, oe.from_plug) != \
                (orig_prev[0], exit_plug(orig_prev[1])):
            from .ditch_graph import _rc
            lab = _rc(lab)
        g.add_edge_observation(prev_key, exit_plug(prev_dir), clone_key,
                               entry_plug(md), off, lab)
        g.edges[list(g._adj[(clone_key, entry_plug(md))])[0]].copy_num = 1
        if oe is not None:
            oe.occ = max(oe.occ - support, 1)
        prev_key, prev_dir = clone_key, md
        orig_prev = (mk, md)
    # final hop: clone -> target
    oe = find_edge(*orig_prev, tkey, tdir)
    off = oe.offset() if oe else 0
    lab = oe.label() if oe else ""
    if oe is not None and (oe.from_node, oe.from_plug) != \
            (orig_prev[0], exit_plug(orig_prev[1])):
        from .ditch_graph import _rc
        lab = _rc(lab)
    g.add_edge_observation(prev_key, exit_plug(prev_dir), tkey,
                           entry_plug(tdir), off, lab)
    # disconnect focus/target from the ORIGINAL path entrances so the clones
    # carry the flow
    oe0 = find_edge(focus_key, focus_dir, path[0][0], path[0][1])
    if oe0 is not None:
        g.remove_edge(oe0.key)
    oeN = find_edge(path[-1][0], path[-1][1], tkey, tdir)
    if oeN is not None:
        g.remove_edge(oeN.key)


def resolve_repeats(g: DitchGraph, encoded_reads, min_span: int = 2,
                    llr_thr: float = 1.0, max_rounds: int = 20) -> int:
    """Iteratively apply the best focus until none passes the threshold."""
    walks = read_walks(encoded_reads)
    dup_counter: dict = {}
    applied = 0
    for _ in range(max_rounds):
        foci = find_foci(g, walks, min_span=min_span, llr_thr=llr_thr)
        if not foci:
            break
        llr, fkey, fdir, target, path, support = foci[0]
        logger.info("FOCUS\t%s\t%s\t->%s\tllr=%.1f\tsupport=%d",
                    fkey, fdir, target[0], llr, support)
        duplicate_along(g, fkey, fdir, target, path, support, dup_counter)
        applied += 1
        # retarget the supporting walks onto the clones: mark the original
        # intermediates consumed by rewriting those walk entries
        pathset = {k for k, _ in path}
        for wi, walk in enumerate(walks):
            keys = [k for k, _ in walk]
            if fkey in keys and target[0] in keys:
                walks[wi] = [((k[0], k[1], -1) if k in pathset else k, d)
                             for k, d in walk]
    return applied
