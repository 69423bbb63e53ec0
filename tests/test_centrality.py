"""Harmonic centrality (batched landmark matrix-BFS) vs a driver-side
all-pairs BFS brute force, on golden fixture graphs and a random graph;
tree-combine and landmark-batching paths must equal the flat/all path."""

import collections

import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.config import RunConfig
from distributed_pagerank_ray.pipelines.centrality import harmonic_centrality
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


def _brute_harmonic(src, dst, n):
    adj = collections.defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    harm = np.zeros(n)
    for s in range(n):
        dist = {s: 0}
        q = [s]
        while q:
            nq = []
            for u in q:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nq.append(v)
            q = nq
        for v, d in dist.items():
            if d > 0:
                harm[v] += 1.0 / d
    return np.round(harm, 6)


def _got(g, **kw):
    df = harmonic_centrality(g, **kw).to_pandas().sort_values("id").reset_index(drop=True)
    return df["harmonic"].to_numpy()


@pytest.mark.parametrize("name", ["chain5", "twocomp", "tri_bridge", "star8"])
def test_harmonic_matches_brute_force(tmp_path, golden_graphs, name):
    src, dst = golden_graphs[name]
    g = _graph(tmp_path, src, dst, name + "_harm")
    want = _brute_harmonic(src, dst, g.n)
    got = _got(g)
    assert np.allclose(got, want, atol=1e-9), (name, got.tolist(), want.tolist())


def test_harmonic_batching_and_tree_combine_equal_flat(tmp_path):
    rng = np.random.default_rng(9)
    V = 60
    # mint=False needs dense ids: a 0..V-1 cycle guarantees every id
    src = np.concatenate([rng.integers(0, V, 150), np.arange(V)])
    dst = np.concatenate([rng.integers(0, V, 150), (np.arange(V) + 1) % V])
    g = _graph(tmp_path, src, dst, "rand_harm", shard_rows=16)
    want = _brute_harmonic(src, dst, V)
    assert np.allclose(_got(g), want, atol=1e-9)
    assert np.allclose(_got(g, batch_k=7), want, atol=1e-9)  # many landmark batches
    assert np.allclose(_got(g, combine_fanin=2), want, atol=1e-9)  # tree fan-in


def test_harmonic_sampled_landmarks_scaled_estimate(tmp_path):
    # star: hub 0 ↔ leaves; with landmarks = {0} the estimate is
    # (n/1)·(1/d(0,v)) = n for each leaf and 0 for the hub
    src = list(range(1, 9))
    dst = [0] * 8
    g = _graph(tmp_path, src, dst, "star_lm")
    df = (
        harmonic_centrality(g, landmarks=[0])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert df["harmonic"][0] == 0.0
    assert (df["harmonic"][1:] == 9.0).all()


def test_harmonic_landmark_validation(tmp_path):
    g = _graph(tmp_path, [0, 1], [1, 2], "bad_lm")
    with pytest.raises(ValueError):
        harmonic_centrality(g, landmarks=[])
    with pytest.raises(ValueError):
        harmonic_centrality(g, landmarks=[99])


def test_distance_summary_brute_force(tmp_path):
    import numpy as np

    from distributed_pagerank_ray.config import RunConfig
    from distributed_pagerank_ray.pipelines.centrality import distance_summary
    from distributed_pagerank_ray.pipelines.graphbuild import build_graph

    rng = np.random.default_rng(17)
    src = rng.integers(0, 20, 40)
    dst = rng.integers(0, 20, 40)
    ds = ray.data.from_items(
        [{"src": int(a), "dst": int(b)} for a, b in zip(src, dst) if a != b]
    )
    g = build_graph(
        ds, str(tmp_path / "dsg"), src_col="src", dst_col="dst", mint=True,
        run_cfg=RunConfig(num_partitions=2, shard_rows=7),
    )
    row = distance_summary(g, directed=False).take_all()[0]

    # brute-force BFS over the minted symmetric graph
    import pyarrow.dataset as pads
    import os

    et = pads.dataset(os.path.join(g.run_dir, "graph", "edges")).to_table(
        columns=["src", "dst"]
    )
    adj: dict[int, set[int]] = {}
    for a, b in zip(et.column("src").to_pylist(), et.column("dst").to_pylist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    import collections

    dists = []
    for s in range(g.n):
        seen = {s: 0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in seen:
                    seen[v] = seen[u] + 1
                    q.append(v)
        dists += [d for v, d in seen.items() if v != s]
    assert row["diameter"] == max(dists)
    assert row["n_pairs"] == len(dists)
    assert row["avg_path_len"] == round(sum(dists) / len(dists), 6)
