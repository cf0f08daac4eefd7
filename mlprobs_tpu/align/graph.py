"""Non-progressive alignment graph (PicXAA lineage).

Reference: baseMSA AlignGraph.h.  Sparse posterior cells are visited in
descending probability; each residue pair is added to a DAG of alignment
columns via one of three operations — new node, column extension, column
merge — each guarded by ancestor/descendant cycle checks; the final DAG
is linearised into alignment columns (Graph2Align/Path2Align).

Host-side algorithm by design (§7.3.7): inherently sequential and
pointer-heavy; the device supplies the sorted sparse cells.  Ancestor /
descendant sets are numpy bool matrices so closure updates are
vectorised.
"""
from __future__ import annotations

import sys

import numpy as np

from mlprobs_tpu.core.msa import MSA


class AlignGraph:
    def __init__(self, num_seqs: int, seq_lengths: list[int]):
        self.num_seqs = num_seqs
        self.lengths = seq_lengths
        cap = int(1.5 * max(seq_lengths)) + 128
        self.cap = cap
        # children adjacency (list of lists), node count
        self.children: list[list[int]] = []
        # present[i][j] = node id of residue j of sequence i, or -1
        self.present = [np.full(l, -1, dtype=np.int64)
                        for l in seq_lengths]
        # ancs[i, j] = node j is an ancestor of node i (and transposed)
        self.ancs = np.zeros((0, 0), dtype=bool)
        self.descs = np.zeros((0, 0), dtype=bool)

    # -------------------------------------------------------------- helpers
    def _grow(self) -> int:
        """Append an empty node; returns its id."""
        n = len(self.children)
        self.children.append([])
        if self.ancs.shape[0] <= n:
            grow = max(64, n)
            na = np.zeros((n + grow, n + grow), dtype=bool)
            na[: self.ancs.shape[0], : self.ancs.shape[1]] = self.ancs
            self.ancs = na
            nd = np.zeros((n + grow, n + grow), dtype=bool)
            nd[: self.descs.shape[0], : self.descs.shape[1]] = self.descs
            self.descs = nd
        return n

    def _close_nodes(self, seq: int, pos: int) -> tuple[int, int]:
        """Nearest preceding/succeeding node ids in this sequence (-1 none)."""
        row = self.present[seq]
        parent = -1
        for i in range(pos - 1, -1, -1):
            if row[i] != -1:
                parent = int(row[i])
                break
        child = -1
        for i in range(pos + 1, len(row)):
            if row[i] != -1:
                child = int(row[i])
                break
        return parent, child

    def _propagate(self, node: int):
        """Transitive-closure update around `node` (reference AA/DD loops)."""
        n = len(self.children)
        aa = np.flatnonzero(self.ancs[node, :n])
        dd = np.flatnonzero(self.descs[node, :n])
        if dd.size:
            self.ancs[dd, node] = True
            if aa.size:
                self.ancs[np.ix_(dd, aa)] = True
                self.descs[np.ix_(aa, dd)] = True
        if aa.size:
            self.descs[aa, node] = True

    # ------------------------------------------------------------ new node
    def try_new_node(self, x, y) -> bool:
        px, cx = self._close_nodes(*x)
        py, cy = self._close_nodes(*y)
        parents = sorted({p for p in (px, py) if p != -1})
        children = sorted({c for c in (cx, cy) if c != -1})

        ok = True
        if px != -1 and cy != -1:
            ok = ok and not self.descs[cy, px] and px != cy
        if py != -1 and cx != -1:
            ok = ok and not self.descs[cx, py] and py != cx
        if not ok:
            return False

        new = self._grow()
        self.children[new] = list(children)
        for p in parents:
            self.children[p].append(new)

        # remove redundant direct edges
        if px != -1 and py != -1:
            if self.descs[px, py]:
                self._remove_edge(px, new)
            if self.descs[py, px]:
                self._remove_edge(py, new)
        if cx != -1 and cy != -1:
            if self.descs[cx, cy]:
                self._remove_edge(new, cy)
            if self.descs[cy, cx]:
                self._remove_edge(new, cx)
        for p in parents:
            for c in children:
                self._remove_edge(p, c)

        self.present[x[0]][x[1]] = new
        self.present[y[0]][y[1]] = new

        # ancestors/descendants of the new node
        for p in parents:
            self.ancs[new] |= self.ancs[p]
            self.ancs[new, p] = True
        for c in children:
            self.descs[new] |= self.descs[c]
            self.descs[new, c] = True
        self._propagate(new)
        return True

    def _remove_edge(self, a: int, b: int):
        try:
            self.children[a].remove(b)
        except ValueError:
            pass

    # ------------------------------------------------------- column extend
    def try_extend(self, y, node: int) -> bool:
        # immediate cycle check: node already holds a residue of y's seq
        if (self.present[y[0]] == node).any():
            return False
        py, cy = self._close_nodes(*y)

        ok = True
        if cy != -1:
            ok = ok and not self.descs[cy, node] and cy != node
        if py != -1:
            ok = ok and not self.descs[node, py] and py != node
        if not ok:
            return False

        if py != -1 and node not in self.children[py]:
            self.children[py].append(node)
        if cy != -1 and cy not in self.children[node]:
            self.children[node].append(cy)

        # redundant direct edges (transitive reduction, reference :549-559)
        if py != -1 and self.descs[py, node] and cy != -1:
            pass  # reference removes only under a pre-existing-edge guard
        if py != -1 and cy != -1 and cy in self.children[py]:
            self._remove_edge(py, cy)
        self.present[y[0]][y[1]] = node
        if py != -1:
            self.ancs[node] |= self.ancs[py]
            self.ancs[node, py] = True
        if cy != -1:
            self.descs[node] |= self.descs[cy]
            self.descs[node, cy] = True
        self._propagate(node)
        return True

    # -------------------------------------------------------- column merge
    def try_merge(self, cx: int, cy: int, x, y) -> bool:
        if (self.present[y[0]] == cx).any():
            return False
        if (self.present[x[0]] == cy).any():
            return False
        if cx > cy:
            cx, cy = cy, cx
        if self.descs[cx, cy] or self.descs[cy, cx]:
            return False

        n = len(self.children)
        # merged children: union minus self-reference
        merged = sorted(set(self.children[cx]) | set(self.children[cy]))
        merged = [c for c in merged if c not in (cx, cy)]
        # rewire every parent edge of cy to cx
        for j in range(n):
            if j in (cx, cy):
                continue
            ch = self.children[j]
            if cy in ch:
                ch.remove(cy)
                if cx not in ch:
                    ch.append(cx)
        self.children[cx] = merged
        self.children[cy] = []

        # merge closure rows; cy becomes an alias of cx
        self.ancs[cx] |= self.ancs[cy]
        self.descs[cx] |= self.descs[cy]
        self.ancs[:n, cx] |= self.ancs[:n, cy]
        self.descs[:n, cx] |= self.descs[:n, cy]
        self.ancs[cy] = False
        self.descs[cy] = False
        self.ancs[:n, cy] = False
        self.descs[:n, cy] = False
        self.ancs[cx, cx] = False
        self.descs[cx, cx] = False

        # transitive-reduction cleanup: drop direct edges that are implied
        for p in np.flatnonzero(self.ancs[cx, :n]):
            for d in np.flatnonzero(self.descs[cx, :n]):
                if d in self.children[p]:
                    self._remove_edge(int(p), int(d))

        # relabel cy -> cx in present
        for i in range(self.num_seqs):
            row = self.present[i]
            row[row == cy] = cx
        self._alias = getattr(self, "_alias", {})
        self._alias[cy] = cx
        self._dead = getattr(self, "_dead", set())
        self._dead.add(cy)
        self._propagate(cx)
        return True

    # --------------------------------------------------------- linearise
    def build(self, cells: list[tuple[int, int, int, int, float]]):
        """Insert cells (a, i, b, j, prob) already sorted descending."""
        for a, i, b, j, _p in cells:
            nx = int(self.present[a][i])
            ny = int(self.present[b][j])
            if nx == -1 and ny == -1:
                self.try_new_node((a, i), (b, j))
            elif (nx == -1) != (ny == -1):
                if nx != -1:
                    self.try_extend((b, j), nx)
                else:
                    self.try_extend((a, i), ny)
            elif nx != ny:
                self.try_merge(nx, ny, (a, i), (b, j))

    def linearise(self) -> list[int]:
        """Graph2Align path construction (AddtoPath insertion semantics)."""
        n = len(self.children)
        dead = getattr(self, "_dead", set())
        live = [i for i in range(n) if i not in dead]
        has_parent = set()
        for i in live:
            for c in self.children[i]:
                has_parent.add(c)
        roots = [i for i in live if i not in has_parent]
        path: list[int] = []
        marked = set(dead)

        sys.setrecursionlimit(max(10000, 10 * n + 1000))

        def add_to_path(n1: int, n2: int):
            if n1 == -1:
                h = -1
            else:
                h = path.index(n1)
            path.insert(h + 1, n2)

        def find_path(n1: int):
            for c in self.children[n1]:
                if c not in marked:
                    marked.add(c)
                    add_to_path(n1, c)
                    find_path(c)

        for r in roots:
            add_to_path(-1, r)
            find_path(r)
        if self._order_valid(path):
            return path
        # fall back to a plain Kahn topological sort: the reference's
        # insert-after-parent heuristic can (rarely) order incomparable
        # nodes against a sequence's residue order.
        return self._topo_sort(live)

    def _order_valid(self, path: list[int]) -> bool:
        pos = {node: k for k, node in enumerate(path)}
        for i in range(self.num_seqs):
            row = self.present[i]
            last = -1
            for j in range(self.lengths[i]):
                if row[j] != -1:
                    p = pos.get(int(row[j]))
                    if p is None or p < last:
                        return False
                    last = p
        return True

    def _topo_sort(self, live: list[int]) -> list[int]:
        # order constraints: graph edges + per-sequence residue order
        n = len(self.children)
        succ: dict[int, set[int]] = {i: set(self.children[i]) for i in live}
        for i in range(self.num_seqs):
            row = self.present[i]
            prev = -1
            for j in range(self.lengths[i]):
                if row[j] != -1:
                    node = int(row[j])
                    if prev != -1 and node != prev:
                        succ[prev].add(node)
                    prev = node
        indeg = {i: 0 for i in live}
        for i in live:
            for c in succ[i]:
                indeg[c] += 1
        ready = sorted([i for i in live if indeg[i] == 0])
        out = []
        import heapq

        heapq.heapify(ready)
        while ready:
            i = heapq.heappop(ready)
            out.append(i)
            for c in succ[i]:
                indeg[c] -= 1
                if indeg[c] == 0:
                    heapq.heappush(ready, c)
        return out

    def to_alignment(self, msa: MSA) -> MSA:
        """Path2Align: emit columns + single-residue columns."""
        path = self.linearise()
        pos_in_path = {node: k for k, node in enumerate(path)}
        # residues per node
        cols: dict[int, list[tuple[int, int]]] = {node: [] for node in path}
        # single-residue columns: after which path position?
        src: dict[int, list[tuple[int, int]]] = {}
        zero_pos: list[tuple[int, int]] = []
        for i in range(self.num_seqs):
            row = self.present[i]
            for j in range(self.lengths[i]):
                node = int(row[j])
                if node != -1:
                    cols[node].append((i, j))
                else:
                    ct = j - 1
                    anchor = None
                    while ct >= 0:
                        if row[ct] != -1:
                            anchor = pos_in_path[int(row[ct])]
                            break
                        ct -= 1
                    if anchor is None:
                        zero_pos.append((i, j))
                    else:
                        src.setdefault(anchor, []).append((i, j))

        out_cols: list[np.ndarray] = []
        seqs = msa.ungapped()

        def single_col(i, j):
            col = np.full(self.num_seqs, -1, dtype=np.int8)
            col[i] = seqs[i][j]
            return col

        for (i, j) in zero_pos:
            out_cols.append(single_col(i, j))
        for k, node in enumerate(path):
            col = np.full(self.num_seqs, -1, dtype=np.int8)
            for (i, j) in cols[node]:
                col[i] = seqs[i][j]
            out_cols.append(col)
            for (i, j) in src.get(k, []):
                out_cols.append(single_col(i, j))
        rows = (
            np.stack(out_cols, axis=1)
            if out_cols
            else np.zeros((self.num_seqs, 0), np.int8)
        )
        return MSA(headers=list(msa.headers), rows=rows,
                   labels=msa.labels.copy())


def graph_align(msa: MSA, posts: dict, seqs: list[np.ndarray]) -> MSA:
    """Build the alignment graph from sparse posteriors and linearise."""
    cells = []
    for (a, b), s in posts.items():
        coo = s.tocoo()
        for i, j, p in zip(coo.row, coo.col, coo.data):
            cells.append((a, int(i), b, int(j), float(p)))
    cells.sort(key=lambda t: -t[4])
    g = AlignGraph(msa.num_seqs, [len(s) for s in seqs])
    g.build(cells)
    return g.to_alignment(msa)
