"""Luby-style maximal independent set vs a sequential simulation of
the identical priority rule, plus validity (independence/maximality)
and the planted clique/star closed forms the SQL gate relies on."""

import random

import numpy as np
import pyarrow as pa

import ray.data

import distributed_pagerank_ray.pipelines.mis as mm
from distributed_pagerank_ray.pipelines.mis import _priority, mis_luby


def _brute(edges, n):
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    active, mis, r = set(range(n)), set(), 0
    while active:
        p = {v: int(_priority(np.array([v], np.int64), r)[0]) for v in active}
        win = {v for v in active if all(p[v] < p[u] for u in adj[v] if u in active)}
        killed = set(win)
        for v in win:
            killed |= adj[v] & active
        mis |= win
        active -= killed
        r += 1
    return mis, r, adj


def _ds(edges, n):
    return (
        ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
        ),
        ray.data.from_arrow(pa.table({"v": pa.array(list(range(n)), pa.int64())})),
    )


def test_mis_matches_sequential_rule_and_is_valid():
    rng = random.Random(5)
    n = 40
    edges = set()
    while len(edges) < 70:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    exp, rounds, adj = _brute(edges, n)
    eds, vs = _ds(edges, n)
    got = set(mis_luby(eds, vs, num_partitions=2, num_shards=2).to_pandas()["v"])
    assert got == exp
    assert mm.LAST_STATS["rounds"] == rounds
    assert all(not (adj[a] & got) for a in got)  # independent
    assert all(v in got or (adj[v] & got) for v in range(n))  # maximal


def test_mis_clique_and_star_closed_forms():
    # K5 on 0-4: winner is the round-0 priority argmin
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    eds, vs = _ds(k5, 5)
    got = sorted(mis_luby(eds, vs, num_partitions=2, num_shards=2).to_pandas()["v"])
    p0 = _priority(np.arange(5, dtype=np.int64), 0)
    assert got == [int(np.argmin(p0))]
    # star 10..17 (center 10): {center} iff center is priority-min,
    # else all leaves — and leaves require the second round
    star = [(10, 10 + k) for k in range(1, 8)]
    eds, vs = _ds(star, 18)
    got = set(mis_luby(eds, vs, num_partitions=2, num_shards=2).to_pandas()["v"])
    got -= set(range(10))  # isolated vertices 0..9 all join
    ps = _priority(np.arange(10, 18, dtype=np.int64), 0)
    if ps[0] == ps.min():
        assert got == {10}
    else:
        assert got == set(range(11, 18))
        assert mm.LAST_STATS["rounds"] == 2


def test_mis_empty_graph_takes_all_vertices():
    eds, vs = _ds([], 6)
    got = sorted(mis_luby(eds, vs, num_partitions=2, num_shards=2).to_pandas()["v"])
    assert got == list(range(6))
