"""Brute-force oracles for connected components, label propagation and
triangle counting (capabilities the reference lacks but the north rule
mandates; see SURVEY.md §2.5). Only for small fixture graphs."""

from __future__ import annotations

import numpy as np


def cc_oracle(src: np.ndarray, dst: np.ndarray, n: int | None = None) -> np.ndarray:
    """Undirected connected components; label = min vertex id in component."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if n is None:
        n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if len(src) else 0
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)], dtype=np.int64)


def triangle_oracle(src: np.ndarray, dst: np.ndarray) -> int:
    """Exact undirected triangle count (self-loops and duplicates ignored)."""
    edges = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in edges:
        count += len(adj[a] & adj[b])
    return count // 3


def lpa_oracle(
    src: np.ndarray, dst: np.ndarray, n: int | None = None, max_iters: int = 20
) -> np.ndarray:
    """Deterministic synchronous label propagation on the undirected graph.

    Each step every vertex adopts the most frequent label among its
    neighbors (its own current label participates with count 0 so an
    isolated vertex keeps its label); ties break to the smallest label.
    Stops at fixpoint or after max_iters (synchronous LPA can
    oscillate; the cap matches the engine).
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if n is None:
        n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if len(src) else 0
    nbrs: list[set[int]] = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iters):
        new = labels.copy()
        for u in range(n):
            counts: dict[int, int] = {int(labels[u]): 0}
            for v in nbrs[u]:
                counts[int(labels[v])] = counts.get(int(labels[v]), 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[u] = best[0]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def bfs_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    seeds: list[int],
    n: int | None = None,
    directed: bool = False,
) -> np.ndarray:
    """Hop distance from the seed set; -1 where unreached."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if n is None:
        n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if len(src) else 0
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a == b:
            continue
        adj[a].add(int(b))
        if not directed:
            adj[b].add(int(a))
    dist = np.full(n, -1, dtype=np.int64)
    frontier = sorted(set(int(s) for s in seeds))
    for s in frontier:
        dist[s] = 0
    d = 0
    while frontier:
        nxt = []
        for v in frontier:
            for u in adj[v]:
                if dist[u] < 0:
                    dist[u] = d + 1
                    nxt.append(u)
        frontier = nxt
        d += 1
    return dist
