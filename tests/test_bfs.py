import numpy as np
import pytest

import ray.data

from distributed_pagerank_ray.config import RunConfig
from distributed_pagerank_ray.pipelines.bfs import bfs_hops
from distributed_pagerank_ray.pipelines.graphbuild import build_graph
from oracle.graph_oracle import bfs_oracle


def _graph(tmp_path, src, dst, name):
    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    return build_graph(
        ds,
        str(tmp_path / name),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),
    )


def _dists(res):
    df = res.dists().to_pandas().sort_values("id").reset_index(drop=True)
    return df["dist"].to_numpy()


@pytest.mark.parametrize("name", ["chain5", "twocomp", "tri_bridge", "star8"])
def test_bfs_undirected_matches_oracle(tmp_path, golden_graphs, name):
    src, dst = golden_graphs[name]
    g = _graph(tmp_path, src, dst, name + "_bfs")
    res = bfs_hops(g, [0])
    want = bfs_oracle(src, dst, [0], n=g.n, directed=False)
    got = _dists(res)
    assert np.array_equal(got, want), (name, got.tolist(), want.tolist())
    assert res.converged
    assert res.n_reached == int((want >= 0).sum())


def test_bfs_directed_and_unreached(tmp_path, golden_graphs):
    """chain5 directed from the tail: only the tail is reached; from the
    head every vertex gets its position."""
    src, dst = golden_graphs["chain5"]
    g = _graph(tmp_path, src, dst, "chain5_dbfs")
    res = bfs_hops(g, [0], directed=True)
    want = bfs_oracle(src, dst, [0], n=g.n, directed=True)
    assert np.array_equal(_dists(res), want)
    # unreached (-1) must appear when seeding a sink-side vertex
    res2 = bfs_hops(g, [g.n - 1], directed=True)
    want2 = bfs_oracle(src, dst, [g.n - 1], n=g.n, directed=True)
    got2 = _dists(res2)
    assert np.array_equal(got2, want2)
    assert (got2 == -1).any()


def test_bfs_multi_seed(tmp_path, golden_graphs):
    src, dst = golden_graphs["twocomp"]
    g = _graph(tmp_path, src, dst, "twocomp_msbfs")
    seeds = [0, g.n - 1]
    res = bfs_hops(g, seeds)
    want = bfs_oracle(src, dst, seeds, n=g.n, directed=False)
    assert np.array_equal(_dists(res), want)


def test_bfs_tree_combine_equals_flat(tmp_path, golden_graphs):
    src, dst = golden_graphs["star8"]
    g = _graph(tmp_path, src, dst, "star8_tcbfs")
    flat = _dists(bfs_hops(g, [3]))
    g2 = _graph(tmp_path, src, dst, "star8_tcbfs2")
    tree = _dists(bfs_hops(g2, [3], run_cfg=RunConfig(num_partitions=2, combine_fanin=2)))
    assert np.array_equal(flat, tree)


def test_bfs_seed_validation(tmp_path, golden_graphs):
    src, dst = golden_graphs["chain5"]
    g = _graph(tmp_path, src, dst, "chain5_vbfs")
    with pytest.raises(ValueError):
        bfs_hops(g, [])
    with pytest.raises(ValueError):
        bfs_hops(g, [g.n])
