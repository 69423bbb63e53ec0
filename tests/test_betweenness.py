"""Betweenness centrality (Brandes over the per-shard BSP matrix
exchanges) vs a driver-side Brandes brute force, on golden fixtures,
random graphs, and closed-form topologies; landmark-batching and
tree-combine paths must equal the flat/all path."""

import collections

import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.config import RunConfig
from distributed_pagerank_ray.pipelines.centrality import betweenness_centrality
from distributed_pagerank_ray.pipelines.graphbuild import build_graph


def _graph(tmp_path, src, dst, name, shard_rows=3):
    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    return build_graph(
        ds,
        str(tmp_path / name),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=shard_rows),
    )


def _brute_bc(src, dst, n, directed=False):
    """Brandes, ordered (s, t) pairs — each unordered pair counts twice
    on an undirected graph (the engine's documented convention)."""
    adj = collections.defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            if not directed:
                adj[b].add(a)
    bc = np.zeros(n)
    for s in range(n):
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        preds = collections.defaultdict(list)
        q = collections.deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0.0
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return np.round(bc, 6)


def _got(g, **kw):
    df = (
        betweenness_centrality(g, **kw)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    return df["betweenness"].to_numpy()


@pytest.mark.parametrize("name", ["chain5", "twocomp", "tri_bridge", "star8"])
def test_betweenness_matches_brute_force(tmp_path, golden_graphs, name):
    src, dst = golden_graphs[name]
    g = _graph(tmp_path, src, dst, name + "_bc")
    want = _brute_bc(src, dst, g.n)
    got = _got(g)
    assert np.allclose(got, want, atol=1e-6), (name, got.tolist(), want.tolist())


def test_betweenness_path_closed_form(tmp_path):
    # path P_n: bc(i) = 2·i·(n-1-i) over ordered pairs
    n = 7
    g = _graph(tmp_path, list(range(n - 1)), list(range(1, n)), "path_bc")
    want = np.array([2.0 * i * (n - 1 - i) for i in range(n)])
    assert np.allclose(_got(g), want, atol=1e-6)


def test_betweenness_batching_and_tree_combine_equal_flat(tmp_path):
    rng = np.random.default_rng(23)
    V = 40
    src = np.concatenate([rng.integers(0, V, 120), np.arange(V)])
    dst = np.concatenate([rng.integers(0, V, 120), (np.arange(V) + 1) % V])
    g = _graph(tmp_path, src, dst, "rand_bc", shard_rows=11)
    want = _brute_bc(src, dst, V)
    assert np.allclose(_got(g), want, atol=1e-6)
    assert np.allclose(_got(g, batch_k=7), want, atol=1e-6)  # many landmark batches
    assert np.allclose(_got(g, combine_fanin=2), want, atol=1e-6)  # tree fan-in


def test_betweenness_directed_dag(tmp_path):
    # diamond DAG 0→{1,2}→3→4: two shortest 0→3 paths split sigma
    src = [0, 0, 1, 2, 3]
    dst = [1, 2, 3, 3, 4]
    g = _graph(tmp_path, src, dst, "dag_bc")
    want = _brute_bc(src, dst, 5, directed=True)
    got = _got(g, directed=True)
    assert np.allclose(got, want, atol=1e-6), (got.tolist(), want.tolist())
    # sanity on the known values: bc(3) = pairs (0,4),(1,4),(2,4) via 3 = 3
    assert want[3] == 3.0 and got[3] == 3.0
    # bc(1) = bc(2) = 0.5 each for (0,3) plus 0.5 for (0,4)
    assert got[1] == got[2] == 1.0


def test_betweenness_sampled_landmarks_scaled_estimate(tmp_path):
    # star: hub 0 ↔ 8 leaves; landmarks=[1] → only source-1 paths:
    # δ_1(0) = 7 (one per other leaf), scaled by n/K = 9
    src = list(range(1, 9))
    dst = [0] * 8
    g = _graph(tmp_path, src, dst, "star_bc")
    df = (
        betweenness_centrality(g, landmarks=[1])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert df["betweenness"][0] == 63.0
    assert (df["betweenness"][1:] == 0.0).all()


def test_betweenness_landmark_validation(tmp_path):
    g = _graph(tmp_path, [0, 1], [1, 2], "bad_bc")
    with pytest.raises(ValueError):
        betweenness_centrality(g, landmarks=[])
    with pytest.raises(ValueError):
        betweenness_centrality(g, landmarks=[99])


# ---------------------------------------------------------- closeness sibling


def _brute_closeness(src, dst, n):
    adj = collections.defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = []
    for s in range(n):
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        sm = sum(d for v, d in dist.items() if v != s)
        ct = len(dist) - 1
        out.append((s, ct, sm, round(ct / sm, 6) if sm else 0.0))
    return out


def test_closeness_random_matches_brute(tmp_path, ray_session):
    from distributed_pagerank_ray.pipelines.centrality import closeness_centrality

    rng = np.random.default_rng(3)
    n = 24
    src = rng.integers(0, n, 60)
    dst = rng.integers(0, n, 60)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # ensure every id appears (build_graph vertex set = src ∪ dst)
    src = np.concatenate([src, np.arange(n - 1)])
    dst = np.concatenate([dst, np.arange(1, n)])
    g = _graph(tmp_path, src, dst, "close_rand", shard_rows=7)
    got = (
        closeness_centrality(g, batch_k=5)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = _brute_closeness(src, dst, n)
    for (s, ct, sm, cl), row in zip(want, got.itertuples(index=False)):
        assert row.id == s and row.n_reach == ct and row.sum_dist == sm
        assert row.closeness == cl


def test_closeness_diamond_tail_closed_form(tmp_path, ray_session):
    from distributed_pagerank_ray.pipelines.centrality import closeness_centrality

    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)]
    src = [a for a, _ in pairs]
    dst = [b for _, b in pairs]
    g = _graph(tmp_path, src, dst, "close_diamond", shard_rows=3)
    got = closeness_centrality(g).to_pandas().sort_values("id")
    assert got["sum_dist"].tolist() == [22, 18, 18, 14, 14, 16, 20, 26]
    assert (got["n_reach"] == 7).all()


def test_closeness_landmark_subset_sums_sources_only(tmp_path, ray_session):
    from distributed_pagerank_ray.pipelines.centrality import closeness_centrality

    # path 0-1-2-3; landmarks {0}: sum_dist[v] = dist(0, v), n_reach = 1
    g = _graph(tmp_path, [0, 1, 2], [1, 2, 3], "close_lm", shard_rows=3)
    got = closeness_centrality(g, landmarks=[0]).to_pandas().sort_values("id")
    assert got["sum_dist"].tolist() == [0, 1, 2, 3]
    assert got["n_reach"].tolist() == [0, 1, 1, 1]


def test_eccentricity_brute_and_landmark_lower_bound(tmp_path, ray_session):
    from distributed_pagerank_ray.pipelines.centrality import eccentricity

    rng = np.random.default_rng(17)
    n = 20
    src = np.concatenate([rng.integers(0, n, 40), np.arange(n - 1)])
    dst = np.concatenate([rng.integers(0, n, 40), np.arange(1, n)])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = _graph(tmp_path, src, dst, "ecc_rand", shard_rows=7)
    got = eccentricity(g, batch_k=6).to_pandas().sort_values("id").reset_index(drop=True)
    # brute force
    adj = collections.defaultdict(set)
    for a, b in zip(src, dst):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    want = []
    for s in range(n):
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        want.append(max(dist.values()))
    assert got["ecc"].tolist() == want
    # landmark subset is a lower bound, exact at the landmarks' rows
    sub = eccentricity(g, landmarks=[0, 5]).to_pandas().sort_values("id")
    assert (sub["ecc"].to_numpy() <= got["ecc"].to_numpy()).all()


def test_effective_diameter_brute_and_quantile_edges(tmp_path, ray_session):
    from distributed_pagerank_ray.pipelines.centrality import effective_diameter

    # path graph 0-1-2-3-4: pairwise distance histogram is closed-form
    g = _graph(tmp_path, [0, 1, 2, 3], [1, 2, 3, 4], "effd_path", shard_rows=2)
    got = effective_diameter(g, q=0.9).to_pandas().iloc[0]
    # ordered pairs: d1x8, d2x6, d3x4, d4x2 (n=20); cum(3)=18 = 0.9*20
    assert got["n_pairs"] == 20
    assert got["eff_diameter"] == 3  # cum(3) hits the target exactly
    assert got["mean_dist"] == round((8 + 12 + 12 + 8) / 20, 6)
    # q=1.0 is the true diameter
    full = effective_diameter(g, q=1.0).to_pandas().iloc[0]
    assert full["eff_diameter"] == 4
    # landmark subset counts only sampled source rows
    sub = effective_diameter(g, landmarks=[0]).to_pandas().iloc[0]
    assert sub["n_pairs"] == 4
