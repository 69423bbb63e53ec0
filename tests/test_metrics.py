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
