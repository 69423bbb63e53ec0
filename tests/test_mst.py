"""Borůvka minimum spanning forest vs a driver-side Kruskal under the
identical (w, packed key) total order, plus the planted ring closed
form the SQL gate (g_mst_doc) relies on, label canonicalization, the
O(log V) round bound on a worst-case chain, and fail-loudly guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

import distributed_pagerank_ray.pipelines.mst as mm
from distributed_pagerank_ray.pipelines.mst import boruvka_forest, forest_summary

_SHIFT = 1 << 31


def _kruskal(edges):
    """MSF under (w, key) with parallel edges collapsed to their min w."""
    canon = {}
    for s, d, w in edges:
        if s == d:
            continue
        k = min(s, d) * _SHIFT + max(s, d)
        if k not in canon or w < canon[k]:
            canon[k] = w
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    forest = []
    for w, k in sorted((w, k) for k, w in canon.items()):
        a, b = k // _SHIFT, k % _SHIFT
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            forest.append((a, b, w))
    return sorted(forest), find


def _ds(s, d, w):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(s, np.int64)),
                "dst": pa.array(np.asarray(d, np.int64)),
                "w": pa.array(np.asarray(w, np.int64)),
            }
        )
    )


def test_boruvka_matches_kruskal_and_labels_are_min_vertex():
    rng = np.random.default_rng(7)
    for n, m in [(30, 60), (100, 250), (50, 49), (200, 800)]:
        s = rng.integers(0, n, m)
        d = rng.integers(0, n, m)
        w = rng.integers(0, 1000, m)
        edges = list(zip(s.tolist(), d.tolist(), w.tolist()))
        forest, labels = boruvka_forest(_ds(s, d, w), num_partitions=2, num_shards=2)
        got = sorted(
            map(tuple, forest.to_pandas()[["src", "dst", "w"]].itertuples(index=False))
        )
        want, find = _kruskal(edges)
        assert got == want
        # labels: comp == min vertex id of the connected component
        lab = labels.to_pandas().set_index("v")["comp"].to_dict()
        verts = set(s.tolist()) | set(d.tolist())
        comp_min = {}
        for v in verts:
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        assert all(lab[v] == comp_min[find(v)] for v in verts)


def test_boruvka_round_bound_on_chain():
    # worst case for min-label CC (O(V) rounds); Borůvka + pointer
    # jumping must stay logarithmic: rounds <= ceil(log2 V) + 1.
    n = 257
    s = np.arange(n - 1)
    d = np.arange(1, n)
    w = (s * 37 + 11) % 1000
    forest, labels = boruvka_forest(_ds(s, d, w), num_partitions=2, num_shards=2)
    assert forest.count() == n - 1
    assert set(labels.to_pandas()["comp"]) == {0}
    assert mm.LAST_STATS["rounds"] <= int(np.ceil(np.log2(n))) + 1


def test_boruvka_parallel_edges_and_ties():
    # parallel edges collapse to min w; tie weights break on packed key
    s = [0, 0, 1, 2, 0]
    d = [1, 1, 2, 0, 2]
    w = [5, 3, 3, 3, 9]
    forest, _ = boruvka_forest(_ds(s, d, w), num_partitions=2, num_shards=2)
    got = sorted(
        map(tuple, forest.to_pandas()[["src", "dst", "w"]].itertuples(index=False))
    )
    # triangle all-w=3 after collapse: MSF = two smallest packed keys
    assert got == [(0, 1, 3), (0, 2, 3)]


def test_forest_summary_and_planted_ring_closed_form():
    # the g_mst_doc plant: per 8-group g, ring edges (i,i+1) w=10+i+g%5
    # and chord (0,7) w = 5+g%5 (even g; MSF drops the w=16+g%5 edge)
    # or 99 (odd g; MSF = the path).
    groups = 6
    src, dst, w = [], [], []
    for g in range(groups):
        b = 8 * g
        for i in range(7):
            src.append(b + i)
            dst.append(b + i + 1)
            w.append(10 + i + g % 5)
        src.append(b)
        dst.append(b + 7)
        w.append(5 + g % 5 if g % 2 == 0 else 99)
    forest, labels = boruvka_forest(_ds(src, dst, w), num_partitions=2, num_shards=2)
    fp = forest.to_pandas()
    summ = (
        forest_summary(forest, labels, num_partitions=2, num_shards=2)
        .to_pandas()
        .sort_values("comp")
        .reset_index(drop=True)
    )
    assert list(summ["comp"]) == [8 * g for g in range(groups)]
    assert list(summ["n_edges"]) == [7] * groups
    for g in range(groups):
        exp = (
            5 + g % 5 + sum(10 + i + g % 5 for i in range(6))
            if g % 2 == 0
            else sum(10 + i + g % 5 for i in range(7))
        )
        assert int(summ["total_w"][g]) == exp
        rows = fp[fp["src"] // 8 == g]
        if g % 2 == 0:
            assert ((rows["src"] == 8 * g) & (rows["dst"] == 8 * g + 7)).sum() == 1
            assert not (
                (rows["src"] == 8 * g + 6) & (rows["dst"] == 8 * g + 7)
            ).any()


def test_boruvka_fail_loudly():
    # worker-raised ValueError surfaces wrapped in RayTaskError
    with pytest.raises(Exception, match="vertex ids and weights"):
        boruvka_forest(_ds([0], [1], [-3]))  # negative weight
    with pytest.raises(Exception, match="vertex ids and weights"):
        boruvka_forest(_ds([0], [1 << 31], [1]))  # id out of packed range
    with pytest.raises(RuntimeError):
        boruvka_forest(
            _ds(list(range(63)), list(range(1, 64)), [1] * 63),
            num_partitions=2,
            num_shards=2,
            max_rounds=1,
        )
