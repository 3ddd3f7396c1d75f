"""Union-find (disjoint set) with path compression + union by size.

Driver-side connected components over verified near-dup edges. The edge
set after verification is orders of magnitude smaller than the corpus
(only pairs with exact Jaccard >= tau), so the component pass fits the
driver by design (SURVEY.md §7.5); the scale fallback is the iterative
min-label-propagation groupby in ``stages/cluster.py``.
"""

from __future__ import annotations

from collections.abc import Hashable, Iterable


class UnionFind:
    def __init__(self) -> None:
        self._parent: dict[Hashable, Hashable] = {}
        self._size: dict[Hashable, int] = {}

    def find(self, x: Hashable) -> Hashable:
        parent = self._parent
        if x not in parent:
            parent[x] = x
            self._size[x] = 1
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: Hashable, b: Hashable) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self._size[ra] < self._size[rb]:
            ra, rb = rb, ra
        self._parent[rb] = ra
        self._size[ra] += self._size[rb]

    def add_edges(self, edges: Iterable[tuple[Hashable, Hashable]]) -> None:
        for a, b in edges:
            self.union(a, b)

    def components(self) -> dict[Hashable, list]:
        """root -> sorted members (only nodes seen by find/union)."""
        out: dict[Hashable, list] = {}
        for x in self._parent:
            out.setdefault(self.find(x), []).append(x)
        for members in out.values():
            members.sort()
        return out

    def labels(self) -> dict[Hashable, Hashable]:
        """node -> min member of its component (stable cluster id)."""
        comps = self.components()
        out = {}
        for members in comps.values():
            label = members[0]
            for m in members:
                out[m] = label
        return out
