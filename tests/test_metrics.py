import itertools

import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.pipelines.metrics import degree_assortativity, global_clustering


def test_degree_assortativity_matches_numpy():
    rng = np.random.RandomState(7)
    src = rng.randint(0, 40, 300).astype(np.int64)
    dst = (rng.randint(0, 40, 300) + 100).astype(np.int64)
    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    got = degree_assortativity(ds, num_partitions=2, num_shards=2).take_all()[0]

    from collections import Counter

    od, idg = Counter(src.tolist()), Counter(dst.tolist())
    x = np.array([od[a] for a in src], dtype=np.float64)
    y = np.array([idg[b] for b in dst], dtype=np.float64)
    want = np.corrcoef(x, y)[0, 1]
    assert got["m"] == 300
    assert got["assortativity"] == pytest.approx(round(want, 6), abs=2e-6)


def test_global_clustering_matches_brute_force():
    # K4 plus a pendant: triangles=4, wedges: degrees [3,3,3,4,1]
    pairs = list(itertools.combinations(range(4), 2)) + [(3, 4)]
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in pairs])
    got = global_clustering(ds, num_shards=2).take_all()[0]
    deg = np.zeros(5, dtype=np.int64)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    wedges = int((deg * (deg - 1) // 2).sum())
    assert got["n_triangles"] == 4
    assert got["n_wedges"] == wedges
    assert got["global_clustering"] == pytest.approx(round(12 / wedges, 6))


def test_global_clustering_triangle_free():
    # star graph: no triangles, C = 0
    ds = ray.data.from_items([{"a": 0, "b": i} for i in range(1, 6)])
    got = global_clustering(ds, num_shards=2).take_all()[0]
    assert got["n_triangles"] == 0
    assert got["global_clustering"] == 0.0
    assert got["n_wedges"] == 10


def test_butterfly_count_brute_force():
    """butterfly_count == brute force on a skewed bipartite graph; the
    hub cap drops the hot V vertex and reports it."""
    from collections import defaultdict
    from itertools import combinations

    import ray.data

    from distributed_pagerank_ray.pipelines.metrics import butterfly_count

    rows = []
    for i in range(400):
        rows.append({"u": i % 23, "v": (i * 7 + 1) % 11})
        rows.append({"u": i % 23, "v": (i * 3) % 5})  # v∈[0,5) are hot
        if i % 4 == 0:  # duplicate incidence must collapse
            rows.append({"u": i % 23, "v": (i * 7 + 1) % 11})
        if i % 16 == 0:  # low-degree tail V vertices (survive the cap)
            rows.append({"u": i % 23, "v": 100 + i % 40})

    def brute(max_deg=None):
        inc = {(r["u"], r["v"]) for r in rows}
        by_v = defaultdict(set)
        for u, v in inc:
            by_v[v].add(u)
        if max_deg is not None:
            by_v = {v: us for v, us in by_v.items() if len(us) <= max_deg}
        cn = defaultdict(int)
        for us in by_v.values():
            for a, b in combinations(sorted(us), 2):
                cn[(a, b)] += 1
        return len(cn), sum(c * (c - 1) // 2 for c in cn.values())

    ds = ray.data.from_items(rows).repartition(5)
    got = butterfly_count(ds, num_partitions=4, num_shards=4).take_all()[0]
    assert (got["n_pairs"], got["butterflies"]) == brute()

    capped = butterfly_count(
        ds, num_partitions=4, num_shards=4, max_hub_degree=15
    ).take_all()[0]
    assert (capped["n_pairs"], capped["butterflies"]) == brute(15)
    assert capped["n_hubs_dropped"] > 0


def test_local_clustering_brute_force(ray_session):
    """Per-vertex lcc on a random G(n, p) graph vs itertools brute
    force, plus the structural corners: triangle-free vertices emit
    lcc 0 (the zero-rows union path), degree-1 vertices are absent."""
    import itertools

    import numpy as np

    from distributed_pagerank_ray.pipelines.metrics import local_clustering

    rng = np.random.default_rng(17)
    n = 40
    edges = [(a, b) for a, b in itertools.combinations(range(n), 2) if rng.random() < 0.12]
    edges.append((n, n + 1))  # isolated degree-1 pair: absent from output
    adj = {v: set() for v in range(n + 2)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v, nb in adj.items():
        d = len(nb)
        if d >= 2:
            t = sum(1 for x, y in itertools.combinations(sorted(nb), 2) if y in adj[x])
            want[v] = (d, t, round(2 * t / (d * (d - 1)), 6))
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in edges]).repartition(5)
    got = local_clustering(ds, num_partitions=4, num_shards=4).to_pandas()
    got = got.set_index("vertex").sort_index()
    assert sorted(got.index) == sorted(want)
    for v, (d, t, lcc) in want.items():
        row = got.loc[v]
        assert (row["degree"], row["n_tri"]) == (d, t), v
        assert row["lcc"] == lcc, v
    assert (got["lcc"] == 0).any()  # zero-triangle vertices present


def test_targeted_attack_report_brute(ray_session):
    from distributed_pagerank_ray.pipelines.robustness import targeted_attack_report

    # star (hub 0, leaves 1..5) + disjoint triangle 6-7-8
    pairs = [(0, i) for i in range(1, 6)] + [(6, 7), (7, 8), (6, 8)]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in pairs])
    out = targeted_attack_report(ds, deg_threshold=5).to_pandas().iloc[0]
    # only the star hub has degree >= 5; its removal isolates all leaves
    assert out["n_hubs_removed"] == 1
    assert out["n_before"] == 9 and out["comps_before"] == 2
    assert out["giant_before"] == 6
    assert out["n_after"] == 3 and out["comps_after"] == 1  # only the triangle has edges left
    assert out["giant_after"] == 3
    import pytest

    with pytest.raises(ValueError):
        # removing every vertex of a triangle kills all edges
        targeted_attack_report(
            ray.data.from_items([{"src": 0, "dst": 1}, {"src": 1, "dst": 2}, {"src": 0, "dst": 2}]),
            deg_threshold=2,
        )
