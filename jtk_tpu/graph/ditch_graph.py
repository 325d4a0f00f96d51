"""DitchGraph — bidirected assembly graph over (chunk, cluster) nodes.

Reference: ``haplotyper/src/assemble/ditch_graph/mod.rs`` (SURVEY.md §2.3):
node = (chunk, cluster) with Head/Tail plugs, edge label = representative gap
sequence or overlap offset; constructed from encoded reads; cleaned by
lightweight-edge removal, tip removal, copy-number assignment and
zero-copy-element removal; ``spell`` traverses simple paths into contigs.

Host-side Python by design: graphs are ~10^3 nodes (SURVEY.md §2.5), all the
FLOPs live in the kernels, and correctness of the heuristics matters more than
device execution here.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from .. import seq as seqmod

logger = logging.getLogger(__name__)

HEAD, TAIL = 0, 1  # plug positions


def _rc(label: str) -> str:
    return seqmod.revcomp_ascii(label.encode()).decode()


@dataclass
class DEdge:
    """Bidirected edge between (node, plug) pairs.

    ``key`` is the canonical ordered pair; labels/offsets are stored in the
    canonical direction (from -> to).
    """

    from_node: tuple
    from_plug: int
    to_node: tuple
    to_plug: int
    offsets: list = field(default_factory=list)
    labels: list = field(default_factory=list)
    occ: int = 0
    copy_num: int | None = None

    @property
    def key(self):
        return (self.from_node, self.from_plug, self.to_node, self.to_plug)

    def offset(self) -> int:
        return int(np.median(self.offsets)) if self.offsets else 0

    def label(self) -> str:
        """Representative gap label: median-length observed label
        (ditch_graph/mod.rs:341-404)."""
        if not self.labels:
            return ""
        labs = sorted(self.labels, key=len)
        return labs[len(labs) // 2]


@dataclass
class DNode:
    node: tuple  # (chunk, cluster)
    seq: str
    occ: int = 0
    copy_num: int | None = None


def edge_canonical(n1, p1, n2, p2, offset, label):
    """Canonicalize edge direction; returns (key, offset, label, flipped)."""
    if (n2, p2) < (n1, p1):
        return (n2, p2, n1, p1), offset, _rc(label), True
    return (n1, p1, n2, p2), offset, label, False


class DitchGraph:
    def __init__(self):
        self.nodes: dict[tuple, DNode] = {}
        self.edges: dict[tuple, DEdge] = {}
        self._adj: dict[tuple, set] = defaultdict(set)  # (node, plug) -> edge keys

    # ---------------- construction ----------------

    @classmethod
    def from_encoded_reads(cls, encoded_reads, chunk_seqs: dict,
                           min_span_reads: int = 1) -> "DitchGraph":
        """ditch_graph/mod.rs:406-443."""
        g = cls()
        for er in encoded_reads:
            for n in er.nodes:
                key = (n.chunk, n.cluster)
                if key not in g.nodes:
                    g.nodes[key] = DNode(key, chunk_seqs.get(n.chunk, ""))
                g.nodes[key].occ += 1
        for er in encoded_reads:
            for n1, e, n2 in zip(er.nodes, er.edges, er.nodes[1:]):
                k1 = (n1.chunk, n1.cluster)
                k2 = (n2.chunk, n2.cluster)
                p1 = TAIL if n1.is_forward else HEAD   # exit plug of n1
                p2 = HEAD if n2.is_forward else TAIL   # entry plug of n2
                g.add_edge_observation(k1, p1, k2, p2, e.offset, e.label)
        return g

    def add_edge_observation(self, n1, p1, n2, p2, offset, label):
        key, off, lab, flipped = edge_canonical(n1, p1, n2, p2, offset, label)
        if key not in self.edges:
            self.edges[key] = DEdge(key[0], key[1], key[2], key[3])
            self._adj[(key[0], key[1])].add(key)
            self._adj[(key[2], key[3])].add(key)
        e = self.edges[key]
        e.occ += 1
        e.offsets.append(offset)
        e.labels.append(lab)

    # ---------------- queries ----------------

    def edges_at(self, node, plug):
        return [self.edges[k] for k in self._adj[(node, plug)]
                if k in self.edges]

    def other_end(self, edge: DEdge, node, plug):
        if (edge.from_node, edge.from_plug) == (node, plug):
            return edge.to_node, edge.to_plug
        return edge.from_node, edge.from_plug

    def sanity_check(self):
        """Edge symmetry / adjacency consistency
        (ditch_graph/mod.rs:523-572)."""
        for key, e in self.edges.items():
            assert e.from_node in self.nodes, key
            assert e.to_node in self.nodes, key
            assert key in self._adj[(e.from_node, e.from_plug)]
            assert key in self._adj[(e.to_node, e.to_plug)]

    # ---------------- cleanup ----------------

    def remove_edge(self, key):
        e = self.edges.pop(key, None)
        if e is None:
            return
        self._adj[(e.from_node, e.from_plug)].discard(key)
        self._adj[(e.to_node, e.to_plug)].discard(key)

    def remove_node(self, node):
        for plug in (HEAD, TAIL):
            for key in list(self._adj[(node, plug)]):
                self.remove_edge(key)
            self._adj.pop((node, plug), None)
        self.nodes.pop(node, None)

    def remove_lightweight_edges(self, thr: int, keep_sole: bool = True):
        """Remove edges with occ <= thr unless they are the only connection of
        both endpoints (ditch_graph/mod.rs:1809-1841)."""
        removed = 0
        for key in list(self.edges.keys()):
            e = self.edges.get(key)
            if e is None or e.occ > thr:
                continue
            if keep_sole:
                d1 = len(self._adj[(e.from_node, e.from_plug)])
                d2 = len(self._adj[(e.to_node, e.to_plug)])
                if d1 <= 1 and d2 <= 1:
                    continue
                # keep the heaviest edge at a plug
                occ1 = max(x.occ for x in self.edges_at(e.from_node, e.from_plug))
                occ2 = max(x.occ for x in self.edges_at(e.to_node, e.to_plug))
                if e.occ == occ1 and e.occ == occ2:
                    continue
            self.remove_edge(key)
            removed += 1
        return removed

    def remove_tips(self, frac: float = 0.2, max_len: int = 2):
        """Remove short dead-end paths with weak support
        (ditch_graph/mod.rs:1384-1423 is coverage-based; here a tip is a node
        whose occ < frac * neighborhood occ and which dead-ends within
        ``max_len`` nodes)."""
        removed = 0
        changed = True
        while changed:
            changed = False
            for node in list(self.nodes.keys()):
                dn = self.nodes.get(node)
                if dn is None:
                    continue
                h = self.edges_at(node, HEAD)
                t = self.edges_at(node, TAIL)
                if h and t:
                    continue  # not a dead end
                plug_edges = h or t
                if not plug_edges:
                    continue
                # neighborhood occupancy
                nb_occ = []
                for e in plug_edges:
                    on, op = self.other_end(e, node, HEAD if h else TAIL)
                    sibs = self.edges_at(on, op)
                    nb_occ.extend(x.occ for x in sibs)
                if nb_occ and dn.occ < frac * max(nb_occ):
                    self.remove_node(node)
                    removed += 1
                    changed = True
        return removed

    def remove_zero_copy_elements(self):
        """Drop nodes/edges whose assigned copy number is 0 when removal keeps
        neighbours connected (ditch_graph/mod.rs:893-1033, simplified)."""
        for key in list(self.edges.keys()):
            e = self.edges.get(key)
            if e is None or e.copy_num != 0:
                continue
            d1 = len(self._adj[(e.from_node, e.from_plug)])
            d2 = len(self._adj[(e.to_node, e.to_plug)])
            if d1 > 1 or d2 > 1:
                self.remove_edge(key)
        for node in list(self.nodes.keys()):
            dn = self.nodes[node]
            if dn.copy_num == 0:
                self.remove_node(node)

    def connected_components(self):
        from .find_union import FindUnion
        idx = {n: i for i, n in enumerate(self.nodes)}
        fu = FindUnion(len(idx))
        for e in self.edges.values():
            fu.unite(idx[e.from_node], idx[e.to_node])
        comps = defaultdict(list)
        for n, i in idx.items():
            comps[fu.find(i)].append(n)
        return list(comps.values())

    # ---------------- contig generation ----------------

    def _simple_path_from(self, node, plug, visited):
        """Walk simple path starting by exiting ``node`` through ``plug``."""
        path = [(node, plug)]  # (node, exit plug)
        visited.add(node)
        cur, exit_plug = node, plug
        while True:
            edges = self.edges_at(cur, exit_plug)
            if len(edges) != 1:
                break
            e = edges[0]
            nxt, entry = self.other_end(e, cur, exit_plug)
            if nxt in visited:
                break
            if len(self.edges_at(nxt, entry)) != 1:
                break
            visited.add(nxt)
            exit_plug = TAIL if entry == HEAD else HEAD
            path.append((nxt, exit_plug))
            cur = nxt
        return path

    def spell(self):
        """Traverse simple paths into contigs
        (sequence_generation.rs:261-459).  Returns list of contig dicts:
        seq, summary [(chunk, cluster, strand, occ, copy)], edges walked.
        """
        visited = set()
        contigs = []
        # boundary-first: nodes with a free plug or branching neighbourhood
        def is_boundary(node):
            for plug in (HEAD, TAIL):
                edges = self.edges_at(node, plug)
                if len(edges) == 0:
                    return plug
                if len(edges) > 1:
                    return plug
                e = edges[0]
                on, op = self.other_end(e, node, plug)
                if len(self.edges_at(on, op)) > 1:
                    return plug
            return None

        candidates = sorted(self.nodes.keys())
        for node in candidates:
            if node in visited:
                continue
            bplug = is_boundary(node)
            if bplug is None:
                continue
            # enter at the boundary plug; exit through the other one
            exit_plug = TAIL if bplug == HEAD else HEAD
            path = self._simple_path_from(node, exit_plug, visited)
            contigs.append(self._path_to_contig(path))
        # leftover cycles
        for node in candidates:
            if node not in visited:
                path = self._simple_path_from(node, TAIL, visited)
                contigs.append(self._path_to_contig(path))
        return contigs

    def _path_to_contig(self, path):
        parts = []
        summary = []
        tiles = []  # per-node contig coordinate spans (ContigEncoding
        #             counterpart, sequence_generation.rs:261-459)
        pos = 0
        for i, (node, exit_plug) in enumerate(path):
            dn = self.nodes[node]
            fwd = exit_plug == TAIL  # entered at HEAD -> forward orientation
            seq = dn.seq if fwd else _rc(dn.seq)
            if i == 0:
                parts.append(seq)
                tiles.append({"node": node, "fwd": fwd, "start": pos,
                              "end": pos + len(seq)})
                pos += len(seq)
            else:
                # find connecting edge between prev node and this one
                prev_node, prev_plug = path[i - 1]
                e = None
                for cand in self.edges_at(prev_node, prev_plug):
                    on, op = self.other_end(cand, prev_node, prev_plug)
                    if on == node and op == (HEAD if fwd else TAIL):
                        e = cand
                        break
                off = e.offset() if e else 0
                label = e.label() if e else ""
                if e is not None:
                    # label stored in canonical direction; flip if walking
                    # against it
                    if (e.from_node, e.from_plug) != (prev_node, prev_plug):
                        label = _rc(label)
                if off >= 0:
                    if label:
                        parts.append(label)
                        pos += len(label)
                    parts.append(seq)
                    tiles.append({"node": node, "fwd": fwd, "start": pos,
                                  "end": pos + len(seq)})
                    pos += len(seq)
                else:
                    trimmed = seq[-off:]
                    parts.append(trimmed)
                    tiles.append({"node": node, "fwd": fwd,
                                  "start": pos + off,
                                  "end": pos + len(trimmed)})
                    pos += len(trimmed)
            summary.append((node[0], node[1], fwd, dn.occ,
                            dn.copy_num if dn.copy_num is not None else 1))
        return {"seq": "".join(parts), "summary": summary, "path": path,
                "tiles": tiles}

    def spell_with_paths(self):
        """spell() keeping the raw (node, exit_plug) paths for link emission."""
        return self.spell()

    # ---------------- stats ----------------

    def stats(self):
        return {
            "nodes": len(self.nodes),
            "edges": len(self.edges),
            "total_occ": sum(n.occ for n in self.nodes.values()),
        }
