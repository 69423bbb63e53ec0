"""k-truss (pipelines/ktruss): brute-force parity, cascade behavior,
and the packed-key/precondition guards."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from distributed_pagerank_ray.pipelines.ktruss import edge_support, ktruss


def _brute_truss(pairs, k):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in edges}
        weak = {e for e, s in sup.items() if s < k - 2}
        if not weak:
            return {e: sup[e] for e in edges}
        edges -= weak


def _ds(pairs):
    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    return ray.data.from_arrow(pa.table({"src": pa.array(a), "dst": pa.array(b)})).repartition(3)


def test_ktruss_matches_brute_force_random():
    rng = np.random.default_rng(7)
    n, m = 40, 260
    pairs = [tuple(rng.integers(0, n, 2)) for _ in range(m)]
    k = 4
    got = ktruss(_ds(pairs), k).to_pandas().sort_values(["a", "b"])
    exp = _brute_truss(pairs, k)
    assert {(r.a, r.b): r.support for r in got.itertuples()} == exp


def test_ktruss_cascade_peels_triangle_chain():
    """Removing support-1 edges must CASCADE: the chain's middle edge
    survives round 1 (support 2) and only dies in round 2."""
    k4 = list(itertools.combinations(range(4), 2))
    chain = [(3, 4), (3, 5), (4, 5), (4, 6), (5, 6), (6, 7)]
    got = ktruss(_ds(k4 + chain), 4).to_pandas().sort_values(["a", "b"])
    assert [tuple(r) for r in got.to_numpy()] == [
        (a, b, 2) for a, b in k4
    ]


def test_edge_support_counts_all_three_edges():
    from distributed_pagerank_ray.pipelines.triangles import canonical_undirected

    tri = [(0, 1), (1, 2), (0, 2), (2, 3)]
    sup = (
        edge_support(canonical_undirected(_ds(tri)))
        .to_pandas()
        .sort_values(["a", "b"])
    )
    assert {(r.a, r.b): r.support for r in sup.itertuples()} == {
        (0, 1): 1,
        (0, 2): 1,
        (1, 2): 1,
    }


def test_ktruss_guards():
    with pytest.raises(ValueError):
        ktruss(_ds([(0, 1)]), 2)
    # the packed-key guard fires only once a triangle touches the big id
    big = _ds([(0, 1 << 31), (0, 1), (1, 1 << 31)])
    with pytest.raises(Exception):
        ktruss(big, 3).to_pandas()
