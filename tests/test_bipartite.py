"""Bipartiteness via double-cover CC vs a brute-force 2-coloring."""

from collections import defaultdict, deque

import ray.data

from distributed_pagerank_ray.pipelines.bipartite import bipartiteness


def _brute(edges, n):
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    color = {}
    comp = {}
    bip = {}
    for s in range(n):
        if s in color or s not in adj:
            continue
        color[s] = 0
        seen = [s]
        ok = True
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in color:
                    color[w] = color[u] ^ 1
                    seen.append(w)
                    q.append(w)
                elif color[w] == color[u]:
                    ok = False
        m = min(seen)
        for v in seen:
            comp[v] = m
            bip[v] = ok
    return comp, bip


def test_bipartiteness_brute_force(tmp_path):
    # mixed: even cycle, odd cycle, tree, two joined odd/even parts
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),          # 4-cycle: bipartite
        (4, 5), (5, 6), (6, 4),                  # triangle: not
        (7, 8), (8, 9), (7, 10),                 # tree: bipartite
        (11, 12), (12, 13), (13, 14), (14, 15), (15, 11), (13, 11),  # 5-cycle + chord
        (16, 4),                                 # pendant into the triangle comp
    ]
    comp, bip = _brute(edges, 17)
    ds = ray.data.from_items([{"src": u, "dst": v} for u, v in edges]).repartition(3)
    got = bipartiteness(ds, str(tmp_path / "bip")).take_all()
    assert len(got) == len(comp)
    for r in got:
        assert r["component"] == comp[r["id"]], r
        assert r["bipartite"] == bip[r["id"]], r
