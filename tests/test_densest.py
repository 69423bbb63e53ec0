"""Densest-subgraph greedy peel: brute-force parity + planted closed form.

The brute force replays the SAME batched peel sequentially with Python
sets (the algorithm is deterministic — no tie-breaks: a round removes
ALL vertices at or under the threshold), so engine/brute agreement
pins the distributed plumbing (count BSP, kill filter, removal-log
member recovery), while the planted test pins the algorithm itself
against hand-derived outcomes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from distributed_pagerank_ray.pipelines.densest import LAST_STATS, densest_subgraph


def _brute_peel(pairs, eps=(0, 1)):
    """Sequential replay of the batched peel; returns (members, e, v)."""
    en, ed = eps
    edges = {tuple(p) for p in pairs}
    best = (0, 0, frozenset())  # (e, v, members)
    while edges:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        ne, nv = len(edges), len(deg)
        if best[1] == 0 or ne * best[1] > best[0] * nv:
            best = (ne, nv, frozenset(deg))
        kill = {v for v, d in deg.items() if d * nv * ed <= 2 * ne * (ed + en)}
        edges = {(a, b) for a, b in edges if a not in kill and b not in kill}
    return best


def _run(pairs, **kw):
    t = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    members, stats = densest_subgraph(ray.data.from_arrow(t), **kw)
    got = set()
    for b in members.iter_batches(batch_format="pyarrow"):
        if "v" in b.column_names:
            got.update(b.column("v").to_pylist())
    return got, stats


def _random_pairs(rng, n, m):
    seen = set()
    while len(seen) < m:
        a, b = rng.integers(0, n, 2)
        if a != b:
            seen.add((min(int(a), int(b)), max(int(a), int(b))))
    return sorted(seen)


def test_brute_parity_random_graphs():
    rng = np.random.default_rng(5)
    for n, m in [(12, 18), (30, 60), (50, 140)]:
        pairs = _random_pairs(rng, n, m)
        want_e, want_v, want_members = _brute_peel(pairs)
        got, stats = _run(pairs, num_partitions=2)
        assert got == set(want_members)
        assert (stats["best_e"], stats["best_v"]) == (want_e, want_v)


def test_brute_parity_eps_positive():
    rng = np.random.default_rng(9)
    pairs = _random_pairs(rng, 40, 100)
    want_e, want_v, want_members = _brute_peel(pairs, eps=(1, 10))
    got, stats = _run(pairs, eps=(1, 10), num_partitions=2)
    assert got == set(want_members)
    assert (stats["best_e"], stats["best_v"]) == (want_e, want_v)


def test_planted_clique_beats_tail_and_ring():
    # group 0 (even): K8 on 0..7 + path 7-8-...-15 (36 edges);
    # group 1 (odd): 16-ring on 16..31 (16 edges).
    pairs = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    pairs += [(i, i + 1) for i in range(7, 15)]
    pairs += [(16 + i, 16 + (i + 1) % 16) for i in range(15)] + [(16, 31)]
    got, stats = _run(pairs, num_partitions=2)
    # round 0: rho = 52/32, threshold 3.25 kills the ring and the tail;
    # round 1: the bare K8 (density 3.5) is the best snapshot.
    assert got == set(range(8))
    assert (stats["best_e"], stats["best_v"]) == (28, 8)
    assert stats["best_round"] == 1 and stats["rounds"] == 2
    assert LAST_STATS["best_e"] == 28


def test_anti_join_path_matches_broadcast():
    rng = np.random.default_rng(13)
    pairs = _random_pairs(rng, 40, 90)
    got_b, stats_b = _run(pairs, num_partitions=2)
    got_a, stats_a = _run(pairs, broadcast_kill_limit=0, num_partitions=2)
    assert got_a == got_b
    assert (stats_a["best_e"], stats_a["best_v"]) == (stats_b["best_e"], stats_b["best_v"])


def test_bad_eps_raises():
    with pytest.raises(ValueError):
        _run([(0, 1)], eps=(-1, 2))
    with pytest.raises(ValueError):
        _run([(0, 1)], eps=(1, 0))
