import numpy as np
import pyarrow as pa

import ray.data

from distributed_pagerank_ray.pipelines.walks import random_walks, step_hash


def _brute(edges, length):
    """Driver-side replay of the walk contract."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    rows = set()
    for start in sorted(adj):
        cur = start
        rows.add((start, 0, start))
        for st in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            d = np.array(sorted(nbrs), dtype=np.int64)
            h = step_hash(np.full(len(d), cur, dtype=np.int64), d, st)
            cur = int(d[np.lexsort((d, h))[0]])
            rows.add((start, st, cur))
    return rows


def test_random_walks_match_brute_force():
    rng = np.random.RandomState(3)
    edges = {(int(rng.randint(0, 40)), int(rng.randint(0, 40))) for _ in range(150)}
    edges = [(s, d) for s, d in edges if s != d]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = {
        (r["walk"], r["step"], r["v"])
        for r in random_walks(ds, length=4, num_partitions=4, num_shards=2).take_all()
    }
    assert got == _brute(edges, 4)


def test_random_walks_dead_end_stops():
    # 0 -> 1 -> 2, and 2 has no out-edges: walk from 0 has steps 0..2 only
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64())})
    )
    got = {
        (r["walk"], r["step"], r["v"])
        for r in random_walks(ds, length=5, num_partitions=2, num_shards=2).take_all()
    }
    assert got == {(0, 0, 0), (0, 1, 1), (0, 2, 2), (1, 0, 1), (1, 1, 2)}


def test_random_walks_id_bound():
    import pytest
    import ray.exceptions

    ds = ray.data.from_arrow(
        pa.table(
            {"src": pa.array([0], pa.int64()), "dst": pa.array([1 << 31], pa.int64())}
        )
    )
    with pytest.raises((ray.exceptions.RayTaskError, ValueError)):
        random_walks(ds, length=1, num_partitions=2, num_shards=2).take_all()


def test_two_hop_counts_brute_force():
    from distributed_pagerank_ray.pipelines.metrics import two_hop_counts

    rng = np.random.RandomState(11)
    edges = {(int(rng.randint(0, 30)), int(rng.randint(0, 30))) for _ in range(90)}
    edges = [(s, d) for s, d in edges if s != d]
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    want = {}
    for v in adj:
        reach = set(adj[v])
        for m in adj[v]:
            reach |= adj.get(m, set())
        reach.discard(v)
        if reach:
            want[v] = len(reach)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = {
        r["id"]: r["n2"]
        for r in two_hop_counts(ds, num_partitions=4, num_shards=2).take_all()
    }
    assert got == want


def test_skipgram_pairs_window():
    from distributed_pagerank_ray.pipelines.walks import skipgram_pairs

    # walk 7: 1 -> 2 -> 3 -> 1 ; walk 9: 5 -> 6
    rows = [
        (7, 0, 1), (7, 1, 2), (7, 2, 3), (7, 3, 1),
        (9, 0, 5), (9, 1, 6),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "walk": pa.array([r[0] for r in rows], pa.int64()),
                "step": pa.array([r[1] for r in rows], pa.int64()),
                "v": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )
    got = {
        (r["a"], r["b"]): r["n"]
        for r in skipgram_pairs(ds, window=2, num_partitions=2, num_shards=2).take_all()
    }
    # window 2 over walk 7: (0,1)(0,2)(1,2)(1,3)(2,3) -> pairs
    # {1,2},{1,3},{2,3},{2,1},{3,1}; walk 9: {5,6}
    assert got == {(1, 2): 2, (1, 3): 2, (2, 3): 1, (5, 6): 1}


def test_sparsify_edges_caps_degree():
    from distributed_pagerank_ray.pipelines.metrics import sparsify_edges

    # hub 0 with 500 out-edges, plus low-degree vertices keeping all
    edges = [(0, d) for d in range(1, 501)] + [(7, 1), (7, 2), (9, 3)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    kept = [
        (r["src"], r["dst"])
        for r in sparsify_edges(ds, k=8, num_partitions=2, num_shards=2).take_all()
    ]
    hub = [e for e in kept if e[0] == 0]
    # E[kept] = k = 8; binomial(500, 8/500) stays well under 30
    assert 1 <= len(hub) <= 30, len(hub)
    # low-degree sources (deg <= k) keep every edge
    assert {e for e in kept if e[0] != 0} == {(7, 1), (7, 2), (9, 3)}
    # deterministic
    kept2 = [
        (r["src"], r["dst"])
        for r in sparsify_edges(ds, k=8, num_partitions=2, num_shards=2).take_all()
    ]
    assert sorted(kept) == sorted(kept2)


def test_two_hop_relay_cap():
    from distributed_pagerank_ray.pipelines.metrics import two_hop_counts

    # hub 100 relays 0..9 -> 200..209; plus a quiet chain 1->2->3
    edges = [(i, 100) for i in range(10)] + [(100, 200 + i) for i in range(10)]
    edges += [(1, 2), (2, 3)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    # unbounded: source 0 reaches {100} + 10 hub targets = 11
    exact = {
        r["id"]: r["n2"]
        for r in two_hop_counts(ds, num_partitions=2, num_shards=2).take_all()
    }
    assert exact[0] == 11
    assert exact[1] == 13  # {100,2} + hub's 10 + {3}
    # capped at 5: the hub (deg 10) contributes no 2-hop pairs
    capped = {
        r["id"]: r["n2"]
        for r in two_hop_counts(
            ds, num_partitions=2, num_shards=2, max_relay_degree=5
        ).take_all()
    }
    assert capped[0] == 1  # only the 1-hop edge to the hub survives
    assert capped[1] == 3  # {100, 2, 3} - quiet relay 2 (deg 1) unaffected
    assert capped[2] == 2  # {100, 3} (2 -> 100 exists too; hub pairs dropped)
